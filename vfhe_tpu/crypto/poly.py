"""Native (plaintext-arithmetic) negacyclic polynomials.

TPU-native rebuild of the reference's plain-field poly layer
(src/vtfhe/crypto/poly.rs): polynomials are just ``(..., N)`` uint64
arrays, every op is batched jnp code, and the NTT is the shared kernel
from ``vfhe_tpu.ntt`` (the reference likewise shares twiddle tables
between its native and circuit NTTs, poly.rs:27-64 vs ntt/mod.rs:12-70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..ntt import ntt_forward, ntt_backward, negacyclic_mul

add = gl.add
sub = gl.sub
pointwise_mul = gl.mul
mul = negacyclic_mul
ntt_fw = ntt_forward
ntt_bw = ntt_backward


def constant(m, n: int) -> jnp.ndarray:
    """Poly with constant coefficient m, rest 0 (ref: poly.rs:90-96)."""
    out = jnp.zeros(n, dtype=jnp.uint64)
    return out.at[0].set(jnp.uint64(m) if not hasattr(m, "dtype") else m)


def scalar_mul(poly: jnp.ndarray, s) -> jnp.ndarray:
    return gl.mul(poly, jnp.uint64(s) if isinstance(s, int) else s)


def rand(key, shape) -> jnp.ndarray:
    return gl.rand(key, shape)


def rand_bin(key, shape) -> jnp.ndarray:
    return gl.rand_bits(key, shape)


def rand_error(key, shape, sigma: float) -> jnp.ndarray:
    """Discrete Gaussian-ish error with std sigma*q, rounded to integers
    (ref: lwe.rs:40-44 error_sample). sigma == 0 -> exact zeros."""
    if sigma == 0.0:
        return jnp.zeros(shape, dtype=jnp.uint64)
    z = jax.random.normal(key, shape, dtype=jnp.float64) * (sigma * float(gl.P))
    return gl.from_noncanonical_i64(jnp.round(z).astype(jnp.int64))


def _negacyclic_shift(poly: jnp.ndarray, shift: int, left: bool) -> jnp.ndarray:
    """Static-shift negacyclic rotate with sign wrap (ref: poly.rs:152-184).

    A shift of s >= N first negates the poly (X^N = -1), then shifts s % N.
    """
    n = poly.shape[-1]
    shift = int(shift)
    if shift >= n:
        poly = gl.neg(poly)
        shift = shift % n
    if shift == 0:
        return poly
    if left:
        # out[i] = poly[i+s] for i < N-s ; out[N-s+j] = -poly[j]
        head = poly[..., shift:]
        tail = gl.neg(poly[..., :shift])
    else:
        # out[i] = -poly[N-s+i] for i < s ; out[s+j] = poly[j]
        head = gl.neg(poly[..., n - shift:])
        tail = poly[..., :n - shift]
    return jnp.concatenate([head, tail], axis=-1)


def left_shift(poly: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Multiply by X^-shift (ref: poly.rs:160-171)."""
    return _negacyclic_shift(poly, shift, left=True)


def right_shift(poly: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Multiply by X^shift (ref: poly.rs:173-184)."""
    return _negacyclic_shift(poly, shift, left=False)


@jax.jit
def rotate_monomial(poly: jnp.ndarray, shift) -> jnp.ndarray:
    """Dynamic (traced) negacyclic right-rotation by ``shift`` in [0, 2N).

    Vectorized equivalent of what the reference's in-circuit barrel shifter
    computes (src/vtfhe/mod.rs:80-107): multiply by X^shift with
    X^N = -1 wraparound. Implemented as a gather + sign flip so it jits
    with a traced shift value.
    """
    n = poly.shape[-1]
    shift = jnp.asarray(shift, dtype=jnp.uint64)
    idx = jax.lax.broadcasted_iota(jnp.uint64, (n,), 0)
    src = (idx - shift) % jnp.uint64(2 * n)  # source index in 2N-extended poly
    wrap = src >= n                          # X^N = -1 region
    src_mod = (src % jnp.uint64(n)).astype(jnp.int64)
    vals = jnp.take(poly, src_mod, axis=-1)
    return jnp.where(wrap, gl.neg(vals), vals)
