"""Vectorized Goldilocks field arithmetic, q = 2^64 - 2^32 + 1.

TPU-native replacement for the plonky2 ``GoldilocksField`` the reference
crate builds on (SURVEY.md L0; /root/reference uses it as both the FHE
ciphertext modulus and the SNARK field). Everything here is shape-
polymorphic jnp code on canonical ``uint64`` arrays (values in [0, q))
so it vectorizes on the TPU VPU and fuses under ``jax.jit``.

Representation notes
--------------------
* 64-bit multiply needs the 128-bit product; we build it from 32-bit
  halves (4 partial products) because no backend gives us u128.
* 2^64 = eps (mod q) with eps = 2^32 - 1, and 2^96 = -1 (mod q); the
  ``_reduce128`` routine uses exactly that identity.
* All public functions take and return *canonical* values, so results
  are bit-exact comparable with the reference implementation's
  ``to_canonical_u64`` values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# q = 2^64 - 2^32 + 1
GOLDILOCKS_P = 0xFFFF_FFFF_0000_0001
P = GOLDILOCKS_P
EPSILON = 0xFFFF_FFFF  # 2^64 mod q
# multiplicative generator of F_q^* (Sage's primitive_root(q); also what the
# reference's table generator uses, src/ntt/gen_param_file.sage:93)
GENERATOR = 7
# 2-adicity: q - 1 = 2^32 * (2^32 - 1)
TWO_ADICITY = 32

_U64 = jnp.uint64
_P64 = np.uint64(P)
_EPS64 = np.uint64(EPSILON)


def u64(x) -> jnp.ndarray:
    """Array constructor: python ints / numpy arrays -> canonical uint64."""
    arr = jnp.asarray(np.asarray(x, dtype=np.uint64))
    return arr


def from_int(x: int) -> jnp.ndarray:
    return jnp.asarray(np.uint64(x % P))


def canonicalize(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce a raw uint64 (any value < 2^64) into [0, q).

    2^64 - 1 < 2q, so a single conditional subtract suffices.
    """
    x = x.astype(_U64)
    return jnp.where(x >= _P64, x - _P64, x)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical a + b mod q."""
    s = a + b
    # overflow past 2^64 <=> s < a; 2^64 = eps (mod q). A non-overflowing
    # sum may still be >= q; both cases are fixed by adding eps == -q mod 2^64.
    adjust = (s < a) | (s >= _P64)
    return s + jnp.where(adjust, _U64(EPSILON), _U64(0))


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical a - b mod q."""
    d = a - b
    # borrow <=> a < b; then the wrapped d is a - b + 2^64 = (a - b + q) + eps.
    return d - jnp.where(a < b, _U64(EPSILON), _U64(0))


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a == 0, _U64(0), _P64 - a)


def _mul_wide(a: jnp.ndarray, b: jnp.ndarray):
    """Full 128-bit product of two u64s as (hi64, lo64)."""
    mask = _U64(0xFFFF_FFFF)
    a_lo = a & mask
    a_hi = a >> _U64(32)
    b_lo = b & mask
    b_hi = b >> _U64(32)

    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi

    mid = lh + hl
    mid_carry = (mid < lh).astype(_U64)  # contributes 2^96

    lo = ll + (mid << _U64(32))
    lo_carry = (lo < ll).astype(_U64)
    hi = hh + (mid >> _U64(32)) + (mid_carry << _U64(32)) + lo_carry
    return hi, lo


def _reduce128(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Reduce hi*2^64 + lo mod q to canonical form.

    Uses 2^64 = eps and 2^96 = -1 (mod q):
        x = lo + hi_lo*2^64 + hi_hi*2^96 = lo + hi_lo*eps - hi_hi (mod q).
    """
    hi_hi = hi >> _U64(32)
    hi_lo = hi & _U64(0xFFFF_FFFF)

    t0 = lo - hi_hi
    # borrow: the wrap added 2^64 = eps, take it back out
    t0 = t0 - jnp.where(lo < hi_hi, _U64(EPSILON), _U64(0))

    t1 = hi_lo * _U64(EPSILON)  # < 2^64, no overflow
    t2 = t0 + t1
    t2 = t2 + jnp.where(t2 < t1, _U64(EPSILON), _U64(0))
    return canonicalize(t2)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical a * b mod q."""
    hi, lo = _mul_wide(a, b)
    return _reduce128(hi, lo)


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def mul_add(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a * b + c mod q (the plonky2 builder's fused op)."""
    return add(mul(a, b), c)


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a ** e mod q for a *static* python-int exponent (unrolled in jit)."""
    e = int(e)
    if e == 0:
        return jnp.full_like(a, _U64(1))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def pow_const_loop(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a ** e via a fori_loop square-and-multiply (MSB first).

    Same work as :func:`pow_const` but the jit graph is ONE small loop
    body — XLA's optimizer degrades catastrophically on the 127-deep
    unrolled multiply chain of a^(q-2) when it is fused with surrounding
    ops, so any big-exponent pow inside a larger jit must use this.
    """
    e = int(e)
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                 dtype=np.uint64))

    def body(i, acc):
        acc = mul(acc, acc)
        return jnp.where(bits[i] == 1, mul(acc, a), acc)

    return jax.lax.fori_loop(0, nbits, body, jnp.ones_like(a))


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Multiplicative inverse via Fermat: a^(q-2). inv(0) returns 0."""
    return pow_const_loop(a, P - 2)


def batch_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion along the last axis (zeros pass through).

    One field inversion + O(n) multiplications instead of n inversions.
    """
    n = a.shape[-1]
    safe = jnp.where(a == 0, _U64(1), a)

    def scan_fwd(carry, x):
        nxt = mul(carry, x)
        return nxt, carry

    prefix_total, prefix = jax.lax.scan(scan_fwd, jnp.ones(a.shape[:-1], _U64),
                                        jnp.moveaxis(safe, -1, 0))
    total_inv = inv(prefix_total)

    def scan_bwd(carry, x):
        x_val, pref = x
        out = mul(carry, pref)
        nxt = mul(carry, x_val)
        return nxt, out

    _, invs = jax.lax.scan(scan_bwd, total_inv,
                           (jnp.moveaxis(safe, -1, 0), prefix), reverse=True)
    invs = jnp.moveaxis(invs, 0, -1)
    return jnp.where(a == 0, _U64(0), invs)


def from_noncanonical_i64(x: jnp.ndarray) -> jnp.ndarray:
    """Signed int64 -> canonical field element (for Gaussian error samples;
    ref: crypto/lwe.rs:40-44 uses from_noncanonical_i64)."""
    x = jnp.asarray(x, dtype=jnp.int64)
    mag = canonicalize(jnp.abs(x).astype(_U64))
    return jnp.where(x < 0, neg(mag), mag)


def rand(key, shape=()) -> jnp.ndarray:
    """Uniform field elements (negligible mod bias of ~2^-32)."""
    bits = jax.random.bits(key, shape=shape, dtype=jnp.uint64)
    return canonicalize(bits)


def rand_bits(key, shape=()) -> jnp.ndarray:
    """Uniform {0, 1} elements (binary secret keys)."""
    return jax.random.bits(key, shape=shape, dtype=jnp.uint64) & _U64(1)


# ---------------------------------------------------------------------------
# host-side (python int) helpers — used for parameter/table generation and in
# the verifier where scalar math is clearer than device math
# ---------------------------------------------------------------------------

def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_mul(a: int, b: int) -> int:
    return (a * b) % P


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


def h_pow(a: int, e: int) -> int:
    return pow(a, e, P)


def h_neg(a: int) -> int:
    return (-a) % P


def primitive_root_of_unity(order: int) -> int:
    """g^((q-1)/order) for order | q-1 (order must divide 2^32 * (2^32-1))."""
    assert (P - 1) % order == 0, f"order {order} does not divide q-1"
    return pow(GENERATOR, (P - 1) // order, P)
