"""Native TFHE crypto layer: witness generator, keygen tool, and test oracle
(ref: src/vtfhe/crypto/mod.rs:1-5 — "structures that hold the data for the
circuits ... compute and set the inputs and retrieve the outputs")."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from . import poly, lwe, glwe, glev, ggsw


def get_testv(p: int, delta, n: int) -> jnp.ndarray:
    """Staircase test polynomial, rotated left by half a block
    (ref: crypto/mod.rs:17-27)."""
    block = n // p
    coeffs = np.repeat(np.arange(p, dtype=np.uint64), block)
    vals = gl.mul(jnp.asarray(coeffs), jnp.uint64(delta))
    return poly.left_shift(vals, block // 2)


def compute_bsk(key, s_lwe: jnp.ndarray, s_glwe: jnp.ndarray, sigma: float,
                ell: int, logb: int) -> jnp.ndarray:
    """Bootstrapping key: one NTT-domain GGSW per LWE key bit
    (ref: crypto/mod.rs:29-45). Shape (n, K, ELL, K, N)."""
    n_lwe = s_lwe.shape[0]
    n = s_glwe.shape[-1]
    keys = jax.random.split(key, n_lwe)
    rows = []
    for i in range(n_lwe):
        m = poly.constant(s_lwe[i], n)
        rows.append(ggsw.ntt_forward(
            ggsw.encrypt(keys[i], s_glwe, m, sigma, ell, logb)))
    return jnp.stack(rows, axis=0)


__all__ = ["poly", "lwe", "glwe", "glev", "ggsw", "get_testv", "compute_bsk"]
