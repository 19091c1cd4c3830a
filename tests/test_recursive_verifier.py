"""In-circuit proof verifier (the recursion engine): staged tests.

Stage 1 (fast-ish): build a small inner circuit covering every gate
kind, prove it natively, then build an outer circuit that runs
verify_proof_circuit on the inner proof and check — at the *trace*
level, no outer proving — that the witness satisfies every constraint.
Tampered proofs must violate constraints; with condition=0 an all-zero
proof must satisfy them (the IVC base case).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.circuit.config import CircuitConfig
from vfhe_tpu.prover import prove, preprocess, verify
from vfhe_tpu.prover.debug import check_witness
from vfhe_tpu.ivc.proof_target import ProofShape, ProofTarget
from vfhe_tpu.ivc.verifier_circuit import verify_proof_circuit


INNER_CONFIG = CircuitConfig(fri_num_queries=4, fri_pow_bits=4,
                             fri_final_poly_len=32)


def _build_inner():
    """A little circuit touching ARITH, SELECT, BASESUM, POS, CONST, PI."""
    b = CircuitBuilder(INNER_CONFIG)
    xs = b.add_virtual_targets(8)
    b.register_public_inputs(xs)
    y = b.mul_vec(xs, xs)
    z = b.add_vec(y, np.full(8, b.constant(17), np.int64))
    sel = b.add_virtual_bool_target_safe()
    out = b.select_vec(np.full(8, sel), z, y)
    bits = b.split_le_vec(out[:2], 64)
    dig = b.hash_n_to_hash_no_pad(np.concatenate([out, bits[0][:4]]))
    b.register_public_inputs(dig)
    data = b.build()
    return data, xs, sel


@pytest.fixture(scope="module")
def inner_proof():
    data, xs, sel = _build_inner()
    pw = PartialWitness()
    pw.set_target_arr(xs, np.arange(1, 9, dtype=np.uint64) * 12345)
    pw.set_bool_target(sel, True)
    proof = prove(data, pw)
    vk = preprocess(data)["vk"]
    verify(vk, proof)
    return data, proof, vk


def _build_outer(inner_data, condition_val=True):
    shape = ProofShape(config=inner_data.config, h=inner_data.h,
                       num_pis=len(inner_data.pi_targets),
                       num_selectors=len(inner_data.gates))
    b = CircuitBuilder(TEST_CONFIG)
    cond = b.add_virtual_bool_target_safe()
    pt = ProofTarget.allocate(b, shape)
    cap = shape.cap_size
    vk_cap = b.add_virtual_targets(cap * 4).reshape(cap, 4)
    vk_digest = b.add_virtual_targets(4)
    verify_proof_circuit(b, shape, inner_data.gates, pt, vk_cap, vk_digest,
                         cond)
    data = b.build()
    return data, pt, cond, vk_cap, vk_digest


@pytest.fixture(scope="module")
def outer_circuit(inner_proof):
    inner_data, proof, vk = inner_proof
    return _build_outer(inner_data)


def _make_pw(pt, cond, vk_cap, vk_digest, proof, vk, condition=True):
    pw = PartialWitness()
    pw.set_bool_target(cond, condition)
    if proof is None:
        pt.assign_dummy(pw)
    else:
        pt.assign(pw, proof)
    pw.set_target_arr(vk_cap, vk.preproc_cap)
    pw.set_target_arr(vk_digest, vk.circuit_digest)
    return pw


def test_verifier_circuit_accepts_valid_proof(inner_proof, outer_circuit):
    inner_data, proof, vk = inner_proof
    data, pt, cond, vk_cap, vk_digest = outer_circuit
    pw = _make_pw(pt, cond, vk_cap, vk_digest, proof, vk)
    failures = check_witness(data, pw)
    assert failures == [], "\n".join(failures[:30])


def test_verifier_circuit_base_case_zero_proof(inner_proof, outer_circuit):
    inner_data, proof, vk = inner_proof
    data, pt, cond, vk_cap, vk_digest = outer_circuit
    pw = _make_pw(pt, cond, vk_cap, vk_digest, None, vk, condition=False)
    failures = check_witness(data, pw)
    assert failures == [], "\n".join(failures[:30])


@pytest.mark.parametrize("tamper", ["pi", "opening", "cap", "pow",
                                    "fri_final", "leaf"])
def test_verifier_circuit_rejects_tampered(inner_proof, outer_circuit,
                                           tamper):
    import copy
    inner_data, proof, vk = inner_proof
    data, pt, cond, vk_cap, vk_digest = outer_circuit
    bad = copy.deepcopy(proof)
    if tamper == "pi":
        bad.public_inputs = bad.public_inputs.copy()
        bad.public_inputs[0] = (int(bad.public_inputs[0]) + 1) % gl.P
    elif tamper == "opening":
        bad.openings[1].at_zeta = bad.openings[1].at_zeta.copy()
        bad.openings[1].at_zeta[0, 0] = \
            (int(bad.openings[1].at_zeta[0, 0]) + 1) % gl.P
    elif tamper == "cap":
        bad.wires_cap = bad.wires_cap.copy()
        bad.wires_cap[0, 0] = (int(bad.wires_cap[0, 0]) + 1) % gl.P
    elif tamper == "pow":
        bad.pow_witness = bad.pow_witness + 1
    elif tamper == "fri_final":
        bad.fri_final_coeffs = bad.fri_final_coeffs.copy()
        bad.fri_final_coeffs[0, 0] = \
            (int(bad.fri_final_coeffs[0, 0]) + 1) % gl.P
    elif tamper == "leaf":
        q = bad.query_openings[0]
        q.leaves[1] = q.leaves[1].copy()
        q.leaves[1][3] = (int(q.leaves[1][3]) + 1) % gl.P
    pw = _make_pw(pt, cond, vk_cap, vk_digest, bad, vk)
    failures = check_witness(data, pw)
    assert failures, f"tamper '{tamper}' went undetected"
