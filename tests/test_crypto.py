"""Native TFHE layer tests, mirroring the reference's crypto unit tests
(glwe.rs:169-214, lwe.rs:78-112) plus native oracles for the gadget ops
the reference only tests in-circuit (external product, gadget product)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.crypto import poly, lwe, glwe, glev, ggsw, get_testv, compute_bsk

KEY = jax.random.PRNGKey(42)
N = 8


def keys(n):
    return jax.random.split(KEY, n)


def test_lwe_roundtrip():
    # ref: lwe.rs:78-112 (test_lwe_ct), sigma=0 for determinism
    n = 16
    k1, k2, k3 = keys(3)
    s = lwe.key_gen(k1, n)
    p = 4
    delta = lwe.get_delta(p)
    m1, m2 = 3, 1
    c1 = lwe.encrypt(k2, s, gl.h_mul(delta, m1), 0.0)
    c2 = lwe.encrypt(k3, s, gl.h_mul(delta, m2), 0.0)
    c = gl.add(c1, c2)
    m_noisy = int(lwe.decrypt(s, c))
    m = round(m_noisy / delta) % p
    assert m == (m1 + m2) % p


def test_glwe_roundtrip_and_sample_extract():
    # ref: glwe.rs:169-192 (test_glwe_ct)
    k = 3
    n_lwe = (k - 1) * N
    k1, k2, k3 = keys(3)
    s = glwe.key_gen(k1, N, k)
    m = poly.rand(k2, (N,))
    c = glwe.encrypt(k3, s, m, 0.0)
    assert (np.asarray(glwe.decrypt(c, s)) == np.asarray(m)).all()

    c0 = glwe.sample_extract(c)
    s0 = glwe.flatten_key(s)
    m0 = lwe.decrypt(s0, c0)
    assert int(m0) == int(m[0])


def test_partial_key():
    # ref: glwe.rs:194-214 (test_partial_key)
    k = 3
    nz = (k - 2) * N + N // 2
    k1, k2, k3 = keys(3)
    s = glwe.partial_key(k1, nz, N, k)
    flat = np.asarray(glwe.flatten_key(s))
    assert (flat[nz:] == 0).all()
    assert set(flat[:nz].tolist()) <= {0, 1}

    m = poly.rand(k2, (N,))
    c = glwe.encrypt(k3, s, m, 0.0)
    assert (np.asarray(glwe.decrypt(c, s)) == np.asarray(m)).all()

    c0 = glwe.partial_sample_extract(c, nz)
    s0 = glwe.flatten_partial_key(s, nz)
    assert int(lwe.decrypt(s0, c0)) == int(m[0])


def test_poly_shifts_match_schoolbook(rng):
    a = jnp.asarray(rng.integers(0, gl.P, N, dtype=np.uint64))
    # right_shift(s) == negacyclic multiply by X^s
    for s in [0, 1, 3, N - 1, N, N + 2, 2 * N - 1]:
        xs = np.zeros(N, dtype=np.uint64)
        sign_flip = (s // N) % 2 == 1
        mono = np.zeros(N, dtype=np.uint64)
        mono[s % N] = gl.P - 1 if sign_flip else 1
        want = np.asarray(poly.mul(a, jnp.asarray(mono)))
        got = np.asarray(poly.right_shift(a, s))
        assert (got == want).all(), f"right_shift({s})"
        # left_shift is the inverse rotation
        back = np.asarray(poly.left_shift(jnp.asarray(got), s))
        assert (back == np.asarray(a)).all(), f"left_shift({s})"


def test_rotate_monomial_matches_right_shift(rng):
    a = jnp.asarray(rng.integers(0, gl.P, N, dtype=np.uint64))
    for s in range(2 * N):
        got = np.asarray(poly.rotate_monomial(a, s))
        want = np.asarray(poly.right_shift(a, s))
        assert (got == want).all(), f"shift {s}"


def test_signed_decompose_recombines(rng):
    for logb, nlimbs in [(8, 8), (5, 13)]:
        x = np.concatenate([
            rng.integers(0, gl.P, 64, dtype=np.uint64),
            np.array([0, 1, gl.P - 1, (1 << 63), (1 << 63) + 12345],
                     dtype=np.uint64)])
        limbs = np.asarray(ggsw.signed_decompose(jnp.asarray(x), logb, nlimbs))
        base = 1 << logb
        recomb = np.zeros(len(x), dtype=object)
        for i in range(nlimbs):
            recomb = (recomb + limbs[i].astype(object) * pow(base, i, gl.P)) % gl.P
        assert (recomb == x.astype(object)).all()
        # each limb must be "small": in [-B/2, B/2] as a field element
        half = base // 2
        for i in range(nlimbs):
            mags = np.minimum(limbs[i].astype(object),
                              (gl.P - limbs[i].astype(object)) % gl.P)
            assert (mags <= half).all()


def test_glev_mul_decrypts():
    # native analogue of test_glev_mul (glev_ct.rs:126-167)
    logb, ell, k = 8, 8, 2
    k1, k2, k3, k4 = keys(4)
    s = glwe.key_gen(k1, N, k)
    m = gl.rand(k2)
    a = poly.rand(k3, (N,))
    ct = glev.encrypt(k4, s, poly.constant(m, N), 0.0, ell, logb)
    out_hat = ggsw.glev_mul(poly.ntt_fw(ct), a, logb)
    out = poly.ntt_bw(out_hat)
    out_lwe = glwe.sample_extract(out)
    m0 = lwe.decrypt(glwe.flatten_key(s), out_lwe)
    assert int(m0) == int(gl.mul(m, a[0]))


def test_external_product_decrypts():
    # native analogue of test_external_product (ggsw_ct.rs:134-180)
    logb, ell, k = 8, 8, 2
    k1, k2, k3, k4, k5 = keys(5)
    s = glwe.key_gen(k1, N, k)
    for bit in [0, 1]:
        m_glwe = poly.rand(k2, (N,))
        ct_glwe = glwe.encrypt(k3, s, m_glwe, 0.0)
        ct_ggsw = ggsw.ntt_forward(
            ggsw.encrypt(k4, s, poly.constant(bit, N), 0.0, ell, logb))
        out = ggsw.external_product(ct_ggsw, ct_glwe, logb)
        m_out = np.asarray(glwe.decrypt(out, s))
        want = np.asarray(poly.scalar_mul(m_glwe, bit))
        assert (m_out == want).all(), f"bit={bit}"


def test_ksk_external_product_switches_key():
    # native analogue of test_key_switch (ggsw_ct.rs:183-221): external
    # product with compute_ksk's GGSW re-encrypts under s_to
    logb, ell, k = 8, 8, 2
    k1, k2, k3, k4, k5 = keys(5)
    s_from = glwe.key_gen(k1, N, k)
    s_to = glwe.key_gen(k2, N, k)
    ksk = ggsw.compute_ksk(k3, s_to, s_from, 0.0, ell, logb)
    m = poly.rand(k4, (N,))
    ct = glwe.encrypt(k5, s_from, m, 0.0)
    out = ggsw.external_product(ksk, ct, logb)
    m_out = np.asarray(glwe.decrypt(out, s_to))
    assert (m_out == np.asarray(m)).all()


def test_mod_switch():
    # ref: lwe.rs:28-38 — top log2(2N)+1 bits with rounding
    p = 2 * N  # mod switch to 2N
    x = np.array([0, 1, gl.P - 1, 1 << 58, (1 << 58) + (1 << 57)],
                 dtype=np.uint64)
    got = np.asarray(lwe.mod_switch_ct(jnp.asarray(x), p))
    for xi, gi in zip(x, got):
        shift = int(xi) >> (64 - (p - 1).bit_length() - 2)
        carry = shift % 2
        assert int(gi) == (shift >> 1) + carry


def test_get_testv():
    p = 2
    delta = lwe.get_delta(2 * p)
    tv = np.asarray(get_testv(p, delta, N))
    # staircase [0,0,0,0,d,d,d,d] left-shifted by block/2 = 2
    want = np.asarray(poly.left_shift(
        jnp.asarray(np.array([0, 0, 0, 0, delta, delta, delta, delta],
                             dtype=np.uint64)), 2))
    assert (tv == want).all()


def test_compute_bsk_shape_and_decrypt():
    logb, ell, k, n_lwe = 8, 8, 2, 2
    k1, k2, k3 = keys(3)
    s_lwe = lwe.key_gen(k1, n_lwe)
    s_glwe = glwe.key_gen(k2, N, k)
    bsk = compute_bsk(k3, s_lwe, s_glwe, 0.0, ell, logb)
    assert bsk.shape == (n_lwe, k, ell, k, N)
    # external product with bsk[i] multiplies by s_lwe[i]
    m = poly.rand(k1, (N,))
    ct = glwe.encrypt(k2, s_glwe, m, 0.0)
    out = ggsw.external_product(bsk[0], ct, logb)
    want = np.asarray(poly.scalar_mul(m, s_lwe[0]))
    assert (np.asarray(glwe.decrypt(out, s_glwe)) == want).all()


def test_compute_bsk_batched_bit_identical():
    """The vmapped one-dispatch compute_bsk must be bit-identical to the
    sequential per-key-bit form (crypto/mod.rs:29-45 semantics) — both
    with and without noise (the vmap lanes must consume exactly the
    per-lane subkeys the eager loop would)."""
    import jax
    from vfhe_tpu.crypto import compute_bsk, poly, glwe, ggsw

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(13), 3)
    n_lwe, N, K, ell, logb = 3, 8, 2, 2, 8
    s_glwe = glwe.key_gen(k1, N, K)
    s_lwe = glwe.flatten_partial_key(
        glwe.partial_key(k2, n_lwe, N, K), n_lwe)
    for sigma in (0.0, 1e-6):
        got = np.asarray(compute_bsk(k0, s_lwe, s_glwe, sigma, ell, logb))
        keys = jax.random.split(k0, n_lwe)
        want = np.stack([
            np.asarray(ggsw.ntt_forward(ggsw.encrypt(
                keys[i], s_glwe, poly.constant(s_lwe[i], N), sigma,
                ell, logb)))
            for i in range(n_lwe)])
        assert np.array_equal(got, want), f"sigma={sigma}"
