"""Gadget-layer tests, mirroring the reference's circuit unit tests
(SURVEY.md section 4): build the gadget, assign native-crypto values,
evaluate (witness-only for speed; full prove+verify for the headline NTT
case), then decrypt/compare against the native layer as oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.crypto import poly as cpoly, lwe as clwe, glwe as cglwe, \
    glev as cglev, ggsw as cggsw
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.prover import prove, preprocess, verify
from vfhe_tpu.gadgets import (GlwePoly, GlweCt, GlevCt, GgswCt, LevCt,
                              ntt_gadget, decompose_vec, poly_select,
                              glwe_select, rotate_poly, rotate_glwe,
                              blind_rotation_step, key_switch)

from golden_ntt import GOLDEN

N = 8
KEY = jax.random.PRNGKey(7)


def keys(n):
    return jax.random.split(KEY, n)


def test_ntt_gadget_proved_bit_exact():
    """The minimum end-to-end slice (BASELINE.json config 1): prove the
    N=8 in-circuit forward NTT and check TESTG -> TESTGHAT on the public
    inputs, like the reference's test_ntt_forward (ntt/mod.rs:81-107)."""
    testg, testghat = GOLDEN[N]
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_targets(N)
    z = ntt_gadget.ntt_forward(b, x)
    b.register_public_inputs(x)
    b.register_public_inputs(z)
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(x, np.array(testg, dtype=np.uint64))
    proof = prove(data, pw)
    assert [int(v) for v in proof.public_inputs[N:2 * N]] == testghat
    verify(preprocess(data)["vk"], proof)


def test_ntt_gadget_backward_witness():
    testg, testghat = GOLDEN[N]
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_targets(N)
    z = ntt_gadget.ntt_backward(b, x)
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(x, np.array(testghat, dtype=np.uint64))
    w = data.eval_witness(pw)
    assert [int(v) for v in w[z]] == testg


def test_decompose_gadget_matches_native(rng):
    logb, nlimbs = 8, 8
    vals = np.concatenate([
        rng.integers(0, gl.P, 6, dtype=np.uint64),
        np.array([0, 1, gl.P - 1, 1 << 63], dtype=np.uint64)])
    b = CircuitBuilder(TEST_CONFIG)
    xs = b.add_virtual_targets(vals.size)
    limbs = decompose_vec(b, xs, logb, nlimbs)
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(xs, vals)
    w = data.eval_witness(pw)
    got = w[limbs]                                   # (nlimbs, L)
    want = np.asarray(cggsw.signed_decompose(jnp.asarray(vals), logb, nlimbs))
    assert (got == want).all()


def test_decompose_logb5_65bit_split_proves(rng):
    """Paper-parameter decomposition (LOGB=5 -> 13 limbs -> 65-bit
    splits): the >64-bit canonicity rows (extra bits constrained zero)
    must hold for honest witnesses through a full prove+verify."""
    logb, nlimbs = 5, 13
    vals = np.concatenate([
        rng.integers(0, gl.P, 4, dtype=np.uint64),
        np.array([0, gl.P - 1, (1 << 32) - 2, 1 << 63], dtype=np.uint64)])
    b = CircuitBuilder(TEST_CONFIG)
    xs = b.add_virtual_targets(vals.size)
    b.register_public_inputs(xs)
    limbs = decompose_vec(b, xs, logb, nlimbs)
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(xs, vals)
    w = data.eval_witness(pw)
    want = np.asarray(cggsw.signed_decompose(jnp.asarray(vals), logb, nlimbs))
    assert (w[limbs] == want).all()
    proof = prove(data, pw)
    verify(preprocess(data)["vk"], proof)


def test_poly_rotate_gadget():
    # ref: test_poly_rotate (vtfhe/mod.rs:188-220)
    k1, k2 = keys(2)
    poly_vals = cpoly.rand(k1, (N,))
    mask_val = int(gl.rand(k2))
    b = CircuitBuilder(TEST_CONFIG)
    p = GlwePoly.new_from_builder(b, N)
    mask = b.add_virtual_target()
    z = rotate_poly(b, p, mask)
    data = b.build()
    pw = PartialWitness()
    p.assign(pw, poly_vals)
    pw.set_target(mask, mask_val)
    w = data.eval_witness(pw)
    out = w[z.coeffs]

    # oracle: native mod switch + negacyclic rotation (check_rotation,
    # vtfhe/mod.rs:154-186)
    shift = int(clwe.mod_switch_element(jnp.uint64(mask_val), N))
    want = np.asarray(cpoly.right_shift(poly_vals, shift))
    assert (out == want).all()


def test_glwe_select_gadget():
    k1, k2, k3 = keys(3)
    k = 2
    ct1 = cpoly.rand(k1, (k, N))
    ct2 = cpoly.rand(k2, (k, N))
    for counter_val, want in [(1, ct1), (2, ct2)]:
        b = CircuitBuilder(TEST_CONFIG)
        g1 = GlweCt.new_from_builder(b, N, k)
        g2 = GlweCt.new_from_builder(b, N, k)
        counter = b.add_virtual_target()
        is_one = b.is_equal(counter, b.one())
        z = glwe_select(b, is_one, g1, g2)
        data = b.build()
        pw = PartialWitness()
        g1.assign(pw, ct1)
        g2.assign(pw, ct2)
        pw.set_target(counter, counter_val)
        w = data.eval_witness(pw)
        assert (w[z.flatten()].reshape(k, N) == np.asarray(want)).all()


def test_glev_mul_gadget_decrypts():
    # ref: test_glev_mul (glev_ct.rs:126-167)
    logb, ell, k = 8, 8, 2
    k1, k2, k3, k4 = keys(4)
    s = cglwe.key_gen(k1, N, k)
    m = gl.rand(k2)
    a = cpoly.rand(k3, (N,))
    ct = cglev.encrypt(k4, s, cpoly.constant(m, N), 0.0, ell, logb)
    ct_hat = cpoly.ntt_fw(ct)

    b = CircuitBuilder(TEST_CONFIG)
    gp = GlwePoly.new_from_builder(b, N)
    gc = GlevCt.new_from_builder(b, N, k, ell)
    z = gc.mul(b, gp, logb)
    data = b.build()
    pw = PartialWitness()
    gp.assign(pw, a)
    gc.assign(pw, ct_hat)
    w = data.eval_witness(pw)
    out_hat = w[z.flatten()].reshape(k, N)

    out = cpoly.ntt_bw(jnp.asarray(out_hat))
    out_lwe = cglwe.sample_extract(out)
    m0 = clwe.decrypt(cglwe.flatten_key(s), out_lwe)
    assert int(m0) == int(gl.mul(m, a[0]))


def test_external_product_gadget_decrypts():
    # ref: test_external_product (ggsw_ct.rs:134-180)
    logb, ell, k = 8, 8, 2
    k1, k2, k3, k4 = keys(4)
    s = cglwe.key_gen(k1, N, k)
    for bit in [0, 1]:
        m_glwe = cpoly.rand(k2, (N,))
        ct_glwe = cglwe.encrypt(k3, s, m_glwe, 0.0)
        ct_ggsw = cggsw.ntt_forward(
            cggsw.encrypt(k4, s, cpoly.constant(bit, N), 0.0, ell, logb))

        b = CircuitBuilder(TEST_CONFIG)
        g = GlweCt.new_from_builder(b, N, k)
        gg = GgswCt.new_from_builder(b, N, k, ell)
        z = gg.external_product(b, g, logb)
        data = b.build()
        pw = PartialWitness()
        g.assign(pw, ct_glwe)
        gg.assign(pw, ct_ggsw)
        w = data.eval_witness(pw)
        out = w[z.flatten()].reshape(k, N)

        m_out = np.asarray(cglwe.decrypt(jnp.asarray(out), s))
        want = np.asarray(cpoly.scalar_mul(m_glwe, bit))
        assert (m_out == want).all(), f"bit={bit}"


def test_blind_rotation_step_gadget():
    # ref: test_blind_rot_step (vtfhe/mod.rs:222-279)
    logb, ell, k = 8, 8, 2
    k1, k2, k3, k4, k5 = keys(5)
    s = cglwe.key_gen(k1, N, k)
    bit = 1
    m_glwe = jnp.asarray(np.arange(N, dtype=np.uint64))
    ct_glwe = cglwe.encrypt(k2, s, m_glwe, 0.0)
    ct_ggsw = cggsw.ntt_forward(
        cggsw.encrypt(k3, s, cpoly.constant(bit, N), 0.0, ell, logb))
    ai = int(gl.rand(k4))

    b = CircuitBuilder(TEST_CONFIG)
    g = GlweCt.new_from_builder(b, N, k)
    gg = GgswCt.new_from_builder(b, N, k, ell)
    mask = b.add_virtual_target()
    z = blind_rotation_step(b, g, gg, mask, logb)
    data = b.build()
    pw = PartialWitness()
    g.assign(pw, ct_glwe)
    gg.assign(pw, ct_ggsw)
    pw.set_target(mask, ai)
    w = data.eval_witness(pw)
    out = w[z.flatten()].reshape(k, N)

    m_out = np.asarray(cglwe.decrypt(jnp.asarray(out), s))
    shift = int(clwe.mod_switch_element(jnp.uint64(ai), N))
    want = np.asarray(cpoly.right_shift(m_glwe, shift))
    assert (m_out == want).all()


def test_key_switch_decrypt_asserted():
    """Behavioral LevCt key switch: a message encrypted under a source
    LWE key is switched to the target key in-circuit and decrypts back
    exactly (sigma=0, full-limb decomposition).

    The reference's own test_key_switch (vtfhe/mod.rs:407-441) only
    proves over random data; this pins the gadget's contract
    z = (0,..,0, body_0) + sum_i body_i * LevMul(ksk_i)
    (vtfhe/mod.rs:31-54) with real key material. Packing convention per
    the mod.rs:29-30 comment ("ksk set up nicely ... literally reading
    off the coefficients"): the input LWE ct (a_1..a_{N-1}, b) is laid
    into the body poly as [b, a_1, .., a_{N-1}]; ksk[i] (i>=1) is a Lev
    encryption of -s_in_{i-1} * B^j (BOTTOM-limb convention,
    lev_ct.rs:63-76) under the target key, and ksk[0] encrypts 0 since
    coeff 0 doubles as the carried-over body."""
    logb, ell = 16, 4            # ell * logb = 64: truncation-free
    n_lwe = 3
    k = 2
    B = 1 << logb
    sub = keys(4 + N * ell)
    s_to = clwe.key_gen(sub[0], n_lwe)
    s_in = clwe.key_gen(sub[1], N - 1)
    m = 1234567890123456789 % gl.P
    in_ct = np.asarray(clwe.encrypt(sub[2], s_in, m, 0.0))  # [a_1..a_7, b]

    ksk_native = np.zeros((N, ell, n_lwe + 1), np.uint64)
    for i in range(N):
        v = 0 if i == 0 else (gl.P - int(s_in[i - 1])) % gl.P
        for j in range(ell):
            mj = (v * pow(B, j, gl.P)) % gl.P
            ksk_native[i, j] = np.asarray(
                clwe.encrypt(sub[3 + i * ell + j], s_to, mj, 0.0))

    b = CircuitBuilder(TEST_CONFIG)
    g = GlweCt.new_from_builder(b, N, k)
    ksk = [LevCt.new_from_builder(b, n_lwe + 1, ell) for _ in range(N)]
    z = key_switch(b, g, ksk, logb)
    data = b.build()
    pw = PartialWitness()
    body = np.concatenate([in_ct[-1:], in_ct[:-1]])
    g.assign(pw, np.stack([np.zeros(N, np.uint64), body]))
    for i, lev in enumerate(ksk):
        lev.assign(pw, ksk_native[i])
    w = data.eval_witness(pw)
    out_ct = jnp.asarray(w[z].astype(np.uint64))
    assert int(clwe.decrypt(s_to, out_ct)) == m


def test_key_switch_gadget_builds():
    # ref: test_key_switch (vtfhe/mod.rs:407-441) — structural test: the
    # LevCt route builds and evaluates (the IVC path uses the GGSW route)
    logb, ell, n_lwe, k = 8, 2, 2, 2
    k1, k2 = keys(2)
    b = CircuitBuilder(TEST_CONFIG)
    g = GlweCt.new_from_builder(b, N, k)
    ksk = [LevCt.new_from_builder(b, n_lwe, ell) for _ in range(N)]
    z = key_switch(b, g, ksk, logb)
    assert z.shape == (n_lwe,)
    data = b.build()
    pw = PartialWitness()
    g.assign(pw, cpoly.rand(k1, (k, N)))
    for lev in ksk:
        lev.assign(pw, cpoly.rand(k2, (ell, n_lwe)))
    w = data.eval_witness(pw)
    assert w[z].shape == (n_lwe,)
