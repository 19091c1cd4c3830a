"""Recursion groundwork: in-circuit extension arithmetic, transcript, and
Merkle path verification (the building blocks of the round-2 in-circuit
FRI verifier)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.field import host as hf
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.gadgets import extension as ge
from vfhe_tpu.ivc.recursion import (RecursiveChallenger,
                                    verify_merkle_path_circuit)
from vfhe_tpu.prover import prove, preprocess, verify, VerificationError
from vfhe_tpu.prover.challenger import Challenger
from vfhe_tpu.prover import merkle


def test_ext_gadgets_match_host(rng):
    b = CircuitBuilder(TEST_CONFIG)
    xv = rng.integers(0, gl.P, (3, 2), dtype=np.uint64)
    yv = rng.integers(0, gl.P, (3, 2), dtype=np.uint64)
    xt = b.add_virtual_targets(6).reshape(3, 2)
    yt = b.add_virtual_targets(6).reshape(3, 2)
    mul_t = ge.ext_mul(b, xt, yt)
    add_t = ge.ext_add(b, xt, yt)
    inv_t = ge.ext_inverse(b, xt)
    pow_t = ge.ext_powers(b, xt[0], 4)
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(xt, xv)
    pw.set_target_arr(yt, yv)
    w = data.eval_witness(pw)
    for i in range(3):
        x = hf.from_array(xv[i])
        y = hf.from_array(yv[i])
        assert tuple(int(v) for v in w[mul_t[i]]) == hf.mul(x, y)
        assert tuple(int(v) for v in w[add_t[i]]) == hf.add(x, y)
        assert tuple(int(v) for v in w[inv_t[i]]) == hf.inv(x)
    x0 = hf.from_array(xv[0])
    for k in range(4):
        assert tuple(int(v) for v in w[pow_t[k]]) == hf.pow_ext(x0, k)


def test_recursive_challenger_matches_native(rng):
    vals = rng.integers(0, gl.P, 13, dtype=np.uint64)
    b = CircuitBuilder(TEST_CONFIG)
    ts = b.add_virtual_targets(13)
    rc = RecursiveChallenger(b)
    rc.observe(ts[:5])
    s1 = rc.sample()
    rc.observe(ts[5:])
    s2 = rc.sample_array(3)
    e = rc.sample_ext()
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(ts, vals)
    w = data.eval_witness(pw)

    ch = Challenger()
    ch.observe(vals[:5])
    n1 = ch.sample()
    ch.observe(vals[5:])
    n2 = ch.sample_array(3)
    ne = ch.sample_ext()
    assert int(w[s1]) == n1
    assert [int(w[t]) for t in s2] == [int(v) for v in n2]
    assert [int(w[t]) for t in e] == [int(v) for v in ne]


@pytest.mark.heavy
def test_chained_sponge_precompute_bitexact(rng):
    """The host-side sponge precompute must CHAIN through duplex sponges
    (each absorb's init is the previous absorb's final state) and through
    standalone permutations (empty-duplex squeezes / partial-chunk
    absorbs), producing a witness bit-identical to the sequential
    variant — the recursive fastpath's native transcript replay."""
    vals = rng.integers(0, gl.P, 40, dtype=np.uint64)
    b = CircuitBuilder(TEST_CONFIG)
    ts = b.add_virtual_targets(40)
    rc = RecursiveChallenger(b)
    rc.observe(ts[:19])            # full chunks + rem -> sponge + poseidon
    s1 = rc.sample_array(9)        # forces an empty-duplex permutation
    rc.observe(ts[19:])            # init chained from the previous state
    s2 = rc.sample_array(2)
    # a digest of assigned values feeding a later absorb (the inner
    # PI-hash pattern, verifier_circuit.py:353)
    dig = b.hash_n_to_hash_no_pad(ts[:8])
    rc.observe(dig)
    s3 = rc.sample()
    for t in np.concatenate([s1, s2, [s3]]):
        b.register_public_input(int(t))
    data = b.build()

    pw_seq = PartialWitness()
    pw_seq.set_target_arr(ts, vals)
    w_seq = data.eval_witness(pw_seq)

    pw_pre = PartialWitness()
    pw_pre.set_target_arr(ts, vals)
    pw_pre.precompute_sponges(data)
    assert pw_pre.sponges_precomputed
    w_pre = np.asarray(data.witness_fn_pre(
        jnp.asarray(pw_pre.initial_vector(data))))
    assert (np.asarray(w_seq) == w_pre).all()

    # and the native transcript agrees with both
    ch = Challenger()
    ch.observe(vals[:19])
    n1 = ch.sample_array(9)
    ch.observe(vals[19:])
    n2 = ch.sample_array(2)
    from vfhe_tpu.hashing import poseidon as HP
    ch.observe(np.array(HP.hash_no_pad_host([int(v) for v in vals[:8]]),
                        dtype=np.uint64))
    n3 = ch.sample()
    got = [int(w_pre[t]) for t in np.concatenate([s1, s2, [s3]])]
    assert got == [int(v) for v in n1] + [int(v) for v in n2] + [n3]


@pytest.mark.slow
def test_merkle_path_in_circuit(rng):
    leaves_v = rng.integers(0, gl.P, (32, 5), dtype=np.uint64)
    tree = merkle.build(jnp.asarray(leaves_v), cap_height=2)
    index = 11
    leaf_v, sibs_v = merkle.open_path(tree, index)
    cap_v = np.asarray(tree.cap)
    n_levels = len(sibs_v)
    cap_bits = 2

    b = CircuitBuilder(TEST_CONFIG)
    leaf_t = b.add_virtual_targets(5)
    bits_t = np.array([b.add_virtual_bool_target_safe()
                       for _ in range(n_levels + cap_bits)])
    sibs_t = b.add_virtual_targets(n_levels * 4).reshape(n_levels, 4)
    cap_t = b.add_virtual_targets(4 * 4).reshape(4, 4)
    verify_merkle_path_circuit(b, leaf_t, bits_t, sibs_t, cap_t)
    data = b.build()

    def make_pw(leaf_val):
        pw = PartialWitness()
        pw.set_target_arr(leaf_t, leaf_val)
        for i, t in enumerate(bits_t):
            pw.set_target(int(t), (index >> i) & 1)
        pw.set_target_arr(sibs_t, np.stack(sibs_v))
        pw.set_target_arr(cap_t, cap_v)
        return pw

    proof = prove(data, make_pw(leaf_v))
    verify(preprocess(data)["vk"], proof)  # valid path proves + verifies

    # wrong leaf -> the connect constraint is violated -> proof rejected
    bad = leaf_v.copy()
    bad[0] = (int(bad[0]) + 1) % gl.P
    bad_proof = prove(data, make_pw(bad))
    with pytest.raises(VerificationError):
        verify(preprocess(data)["vk"], bad_proof)
