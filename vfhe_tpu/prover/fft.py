"""Cyclic FFT / interpolation / coset LDE over Goldilocks subgroups.

The FRI/PLONK side of the house (unlike the FHE side's *negacyclic* NTT in
``vfhe_tpu.ntt``) needs the classic cyclic transform over the order-2^k
multiplicative subgroup H, plus low-degree extension onto a shifted coset
— the plonky2 equivalents are its ``fft``/``coset_fft``/``PolynomialValues``
machinery which the reference leans on for every wire/Z/quotient
polynomial (SURVEY.md L0).

TPU-first design: transforms are batched along *columns* (axis -2 …
leading axes); one call LDEs all 135 wire columns at once. Decimation-in-
time with a single bit-reversal gather, then logN vectorized butterfly
stages, twiddle tables cached per size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..ntt.params import bit_reverse_permutation

# coset shift for LDE domains: the field's multiplicative generator, so the
# LDE coset g*H never intersects H (plonky2 uses the same shift).
COSET_SHIFT = gl.GENERATOR


@functools.lru_cache(maxsize=None)
def _twiddles(n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables for a size-n cyclic DIT FFT."""
    g = gl.primitive_root_of_unity(n)
    if inverse:
        g = gl.h_inv(g)
    tables = []
    logn = n.bit_length() - 1
    for s in range(1, logn + 1):
        m = 1 << s
        w = pow(g, n // m, gl.P)
        row = np.empty(m // 2, dtype=np.uint64)
        acc = 1
        for i in range(m // 2):
            row[i] = acc
            acc = gl.h_mul(acc, w)
        tables.append(row)
    return tuple(tables)


def _fft_core(a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = a.shape[-1]
    if n == 1:
        return a
    logn = n.bit_length() - 1
    perm = jnp.asarray(bit_reverse_permutation(n))
    a = jnp.take(a, perm, axis=-1)
    tables = _twiddles(n, inverse)
    batch = a.shape[:-1]
    for s in range(1, logn + 1):
        m = 1 << s
        w = jnp.asarray(tables[s - 1])  # (m/2,)
        x = a.reshape(*batch, n // m, 2, m // 2)
        u = x[..., 0, :]
        v = gl.mul(x[..., 1, :], w)
        a = jnp.concatenate([gl.add(u, v), gl.sub(u, v)], axis=-1)
        a = a.reshape(*batch, n)
    return a


@jax.jit
def fft(coeffs: jnp.ndarray) -> jnp.ndarray:
    """coeffs (..., n) -> evaluations over H in natural order g^0..g^{n-1}."""
    return _fft_core(coeffs, inverse=False)


@jax.jit
def ifft(evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`fft` (includes the 1/n scale)."""
    n = evals.shape[-1]
    out = _fft_core(evals, inverse=True)
    return gl.mul(out, jnp.uint64(gl.h_inv(n % gl.P)))


@functools.lru_cache(maxsize=None)
def _shift_powers(n: int, shift: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = gl.h_mul(acc, shift)
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def coset_lde(coeffs: jnp.ndarray, rate_bits: int) -> jnp.ndarray:
    """Evaluate (..., h)-coeff polys on the coset COSET_SHIFT * K where K is
    the subgroup of order h * 2^rate_bits. Returns (..., h*2^rate_bits)."""
    h = coeffs.shape[-1]
    n = h << rate_bits
    shifted = gl.mul(coeffs, jnp.asarray(_shift_powers(h, COSET_SHIFT)))
    padded = jnp.concatenate(
        [shifted, jnp.zeros((*coeffs.shape[:-1], n - h), jnp.uint64)], axis=-1)
    return fft(padded)


def eval_poly_ext(coeffs: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation of base-field coeff polys (..., h) at an extension
    point (2,). Returns (..., 2)."""
    from ..field import extension as ee

    def body(acc, c):
        # acc * point + c  (c base field)
        nxt = ee.mul(acc, point)
        nxt = nxt.at[..., 0].set(gl.add(nxt[..., 0], c))
        return nxt, None

    init = jnp.zeros((*coeffs.shape[:-1], 2), jnp.uint64)
    rev = jnp.moveaxis(coeffs, -1, 0)[::-1]
    out, _ = jax.lax.scan(body, init, rev)
    return out


eval_poly_ext_jit = jax.jit(eval_poly_ext)
