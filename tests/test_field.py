"""Property tests for the Goldilocks field kernels against python-int math.

Mirrors the role plonky2's field crate plays for the reference: the whole
stack is only as correct as these ops, including at the 2^32 carry edges
(SURVEY.md section 7, stage 1).
"""

import numpy as np
import jax.numpy as jnp

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.field import extension as ext

P = gl.P

# deliberately include every carry/borrow edge case
EDGE = np.array(
    [0, 1, 2, 0xFFFF_FFFF, 0x1_0000_0000, 0xFFFF_FFFE_FFFF_FFFF,
     P - 1, P - 2, (P - 1) // 2, 0x8000_0000_0000_0000 % P,
     0xFFFF_FFFF_0000_0000, 7, 1 << 40, (1 << 63) % P],
    dtype=np.uint64,
)


def _pairs(rng, n=2000):
    a = np.concatenate([EDGE, rng.integers(0, P, n, dtype=np.uint64)])
    b = np.concatenate([EDGE[::-1], rng.integers(0, P, n, dtype=np.uint64)])
    return a, b


def test_add_sub_neg(rng):
    a, b = _pairs(rng)
    got = np.asarray(gl.add(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) + b.astype(object)) % P
    assert (got.astype(object) == want).all()

    got = np.asarray(gl.sub(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) - b.astype(object)) % P
    assert (got.astype(object) == want).all()

    got = np.asarray(gl.neg(jnp.asarray(a)))
    want = (-a.astype(object)) % P
    assert (got.astype(object) == want).all()


def test_mul(rng):
    a, b = _pairs(rng)
    got = np.asarray(gl.mul(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) * b.astype(object)) % P
    assert (got.astype(object) == want).all()


def test_mul_max_operands():
    a = jnp.asarray(np.array([P - 1], dtype=np.uint64))
    got = int(gl.mul(a, a)[0])
    assert got == ((P - 1) * (P - 1)) % P


def test_canonicalize():
    x = np.array([P, P + 1, 2**64 - 1, 0, P - 1], dtype=np.uint64)
    got = np.asarray(gl.canonicalize(jnp.asarray(x)))
    want = (x.astype(object)) % P
    assert (got.astype(object) == want).all()


def test_inv(rng):
    a = np.concatenate([EDGE[EDGE != 0],
                        rng.integers(1, P, 200, dtype=np.uint64)])
    inv = np.asarray(gl.inv(jnp.asarray(a)))
    prod = np.asarray(gl.mul(jnp.asarray(a), jnp.asarray(inv)))
    assert (prod == 1).all()


def test_batch_inv(rng):
    a = rng.integers(0, P, 64, dtype=np.uint64)
    a[5] = 0  # zeros must pass through as zero
    got = np.asarray(gl.batch_inv(jnp.asarray(a)))
    for ai, gi in zip(a, got):
        if ai == 0:
            assert gi == 0
        else:
            assert (int(ai) * int(gi)) % P == 1


def test_pow_const(rng):
    a = rng.integers(1, P, 50, dtype=np.uint64)
    for e in [0, 1, 2, 7, 31, P - 2]:
        got = np.asarray(gl.pow_const(jnp.asarray(a), e))
        want = np.array([pow(int(x), e, P) for x in a], dtype=object)
        assert (got.astype(object) == want).all()


def test_from_noncanonical_i64():
    x = np.array([0, 1, -1, 2**62, -(2**62)], dtype=np.int64)
    got = np.asarray(gl.from_noncanonical_i64(jnp.asarray(x)))
    want = np.array([int(v) % P for v in x], dtype=object)
    assert (got.astype(object) == want).all()


def test_generator_order():
    # g = 7 generates F_q^*: g^((q-1)/2) != 1 and g^((q-1)/r) != 1 for the
    # odd part's prime factors. q - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537.
    for r in [2, 3, 5, 17, 257, 65537]:
        assert pow(gl.GENERATOR, (P - 1) // r, P) != 1


def test_extension_mul_inv(rng):
    a = rng.integers(0, P, (32, 2), dtype=np.uint64)
    b = rng.integers(0, P, (32, 2), dtype=np.uint64)
    got = np.asarray(ext.mul(jnp.asarray(a), jnp.asarray(b)))
    for (a0, a1), (b0, b1), (c0, c1) in zip(a, b, got):
        a0, a1, b0, b1 = map(int, (a0, a1, b0, b1))
        assert int(c0) == (a0 * b0 + ext.W * a1 * b1) % P
        assert int(c1) == (a0 * b1 + a1 * b0) % P

    ai = ext.inv(jnp.asarray(a))
    prod = np.asarray(ext.mul(jnp.asarray(a), ai))
    assert (prod[:, 0] == 1).all() and (prod[:, 1] == 0).all()


def test_extension_frobenius(rng):
    # Frobenius must be the q-power map: frob(a) == a^q
    a = jnp.asarray(rng.integers(0, P, (8, 2), dtype=np.uint64))
    got = np.asarray(ext.frobenius(a))
    want = np.asarray(ext.pow_const(a, P))
    assert (got == want).all()
