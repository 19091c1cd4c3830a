"""Batched prover: bit-identical to the single prover, and all proofs
verify. (The TPU proofs/s scaling axis — SURVEY.md section 7.)"""

import numpy as np
import pytest

from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.prover import prove, preprocess, verify
from vfhe_tpu.prover.batch import prove_batch


@pytest.fixture(scope="module")
def circuit():
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_input(x)
    b.register_public_input(y)
    z = b.mul(x, y)
    w = b.add(z, b.constant(5))
    b.register_public_input(w)
    bits = b.split_le(w, 64)
    s = b.le_sum(bits)
    b.connect(s, w)
    hh = b.hash_n_to_hash_no_pad([x, y, z, w])
    b.register_public_inputs(hh)
    return b.build(), x, y


def _pw(x, y, vx, vy):
    pw = PartialWitness()
    pw.set_target(x, vx)
    pw.set_target(y, vy)
    return pw


@pytest.mark.heavy
def test_batch_matches_single(circuit):
    data, x, y = circuit
    single = prove(data, _pw(x, y, 3, 7))
    batch = prove_batch(data, [_pw(x, y, 3, 7), _pw(x, y, 10, 11)])
    b0 = batch[0]
    assert (b0.public_inputs == single.public_inputs).all()
    assert (b0.wires_cap == single.wires_cap).all()
    assert (b0.aux_cap == single.aux_cap).all()
    assert (b0.quotient_cap == single.quotient_cap).all()
    for o1, o2 in zip(b0.openings, single.openings):
        assert (o1.at_zeta == o2.at_zeta).all()
        assert (o1.at_gzeta == o2.at_gzeta).all()
    assert (b0.fri_final_coeffs == single.fri_final_coeffs).all()
    assert b0.pow_witness == single.pow_witness
    assert (b0.query_indices == single.query_indices).all()


@pytest.mark.heavy
def test_batch_all_verify(circuit):
    data, x, y = circuit
    vk = preprocess(data)["vk"]
    proofs = prove_batch(data, [_pw(x, y, i, i + 1) for i in range(4)])
    for i, p in enumerate(proofs):
        verify(vk, p)
        assert int(p.public_inputs[2]) == i * (i + 1) + 5


def test_batch_precomputed_witness(circuit):
    """prove_batch(witness=) — the staged-overlap entry used by the
    recursive batch prover — is bit-identical to in-call witness gen."""
    import jax.numpy as jnp
    data, x, y = circuit
    pws = [_pw(x, y, 3, 7), _pw(x, y, 10, 11)]
    ws = []
    for pw in pws:
        w = np.asarray(data.witness_fn(jnp.asarray(
            pw.initial_vector(data))))
        ws.append(w)
    got = prove_batch(data, pws, witness=np.stack(ws))
    ref = prove_batch(data, pws)
    for g, r in zip(got, ref):
        assert (g.public_inputs == r.public_inputs).all()
        assert (g.wires_cap == r.wires_cap).all()
        assert g.pow_witness == r.pow_witness
        assert (g.fri_final_coeffs == r.fri_final_coeffs).all()
