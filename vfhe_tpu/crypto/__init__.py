"""Native TFHE crypto layer: witness generator, keygen tool, and test oracle
(ref: src/vtfhe/crypto/mod.rs:1-5 — "structures that hold the data for the
circuits ... compute and set the inputs and retrieve the outputs")."""

from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=8)
def _bsk_fn(n: int, ell: int, logb: int, sigma: float):
    """One jitted vmap over the LWE key bits: n_lwe GGSW encryptions +
    forward NTTs as ONE device dispatch. The sequential form paid
    ~5.8k eager dispatches through the remote-compile tunnel at paper
    shape (~7 min); this is one compile + one launch, bit-identical
    (each vmap lane sees the same subkey / shapes as the eager call —
    pinned by test_compute_bsk_batched_bit_identical)."""
    def one(subkey, s_bit, s_glwe):
        m = poly.constant(s_bit, n)
        return ggsw.ntt_forward(
            ggsw.encrypt(subkey, s_glwe, m, sigma, ell, logb))
    return jax.jit(jax.vmap(one, in_axes=(0, 0, None)))


def compute_bsk(key, s_lwe: jnp.ndarray, s_glwe: jnp.ndarray, sigma: float,
                ell: int, logb: int) -> jnp.ndarray:
    """Bootstrapping key: one NTT-domain GGSW per LWE key bit
    (ref: crypto/mod.rs:29-45). Shape (n, K, ELL, K, N)."""
    n_lwe = int(s_lwe.shape[0])
    n = int(s_glwe.shape[-1])
    keys = jax.random.split(key, n_lwe)
    return _bsk_fn(n, ell, logb, float(sigma))(
        keys, jnp.asarray(s_lwe), jnp.asarray(s_glwe))


__all__ = ["poly", "lwe", "glwe", "glev", "ggsw", "get_testv", "compute_bsk"]
