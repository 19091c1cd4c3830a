"""Proof serialization roundtrip + chain checkpoint/resume."""

import numpy as np
import pytest

from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.prover import prove, preprocess, verify
from vfhe_tpu.prover.serialize import proof_to_bytes, proof_from_bytes


@pytest.fixture(scope="module")
def small_proof():
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    b.register_public_input(x)
    y = b.mul(x, x)
    b.register_public_input(y)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 9)
    return data, prove(data, pw)


def test_roundtrip_verifies(small_proof):
    data, proof = small_proof
    blob = proof_to_bytes(proof)
    assert isinstance(blob, bytes) and len(blob) > 1000
    restored = proof_from_bytes(blob)
    verify(preprocess(data)["vk"], restored)
    assert (restored.public_inputs == proof.public_inputs).all()
    # canonical: re-serialization is identical
    assert proof_to_bytes(restored) == blob


def test_num_bytes(small_proof):
    data, proof = small_proof
    assert proof.num_bytes() == len(proof_to_bytes(proof))


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    import jax
    import jax.numpy as jnp
    from vfhe_tpu.field import goldilocks as gl
    from vfhe_tpu.crypto import lwe as clwe, glwe as cglwe, ggsw as cggsw, \
        compute_bsk
    from vfhe_tpu.ivc import TEST_PARAMS, verified_pbs, verify_pbs

    p = TEST_PARAMS
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(5), 5)
    s_to = cglwe.partial_key(k1, p.n, p.N, p.K)
    s_lwe = cglwe.flatten_partial_key(s_to, p.n)
    s_glwe = cglwe.key_gen(k2, p.N, p.K)
    bsk = compute_bsk(k3, s_lwe, s_glwe, 0.0, p.ELL, p.LOGB)
    ksk = cggsw.compute_ksk(k4, s_to, s_glwe, 0.0, p.ELL, p.LOGB)
    testv = jnp.asarray(np.arange(p.N, dtype=np.uint64))
    ct = clwe.encrypt(k5, s_lwe, gl.h_mul(gl.P >> 4, 1), 0.0)

    cdir = str(tmp_path / "ckpt")
    out1, proofs1, sc = verified_pbs(ct, testv, bsk, ksk, p,
                                     config=TEST_CONFIG,
                                     checkpoint_dir=cdir)
    # resume run: everything loaded from disk, no proving
    out2, proofs2, _ = verified_pbs(ct, testv, bsk, ksk, p,
                                    config=TEST_CONFIG,
                                    checkpoint_dir=cdir)
    assert (np.asarray(out1) == np.asarray(out2)).all()
    assert all((a.public_inputs == b.public_inputs).all()
               for a, b in zip(proofs1, proofs2))
    verify_pbs(out2, ct, testv, bsk, ksk, proofs2, sc)
