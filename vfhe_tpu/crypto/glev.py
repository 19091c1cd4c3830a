"""Native GLev gadget ciphertexts (ref: src/vtfhe/crypto/glev.rs).

Shape ``(ELL, K, N)``: ELL GLWE encryptions of m * B^(first_limb + i),
using the reference's **top-ELL limbs** convention
(glev.rs:26-38: first_limb = ceil(64/LOGB) - ELL).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from . import glwe, poly


def num_limbs(logb: int) -> int:
    return math.ceil(64 / logb)


def encrypt(key, s: jnp.ndarray, m: jnp.ndarray, sigma: float,
            ell: int, logb: int) -> jnp.ndarray:
    first_limb = num_limbs(logb) - ell
    keys = jax.random.split(key, ell)
    rows = []
    for i in range(ell):
        scale = pow(1 << logb, first_limb + i, gl.P)
        rows.append(glwe.encrypt(keys[i], s, poly.scalar_mul(m, scale), sigma))
    return jnp.stack(rows, axis=0)


def dummy_ct(n: int, k: int, ell: int) -> jnp.ndarray:
    return jnp.zeros((ell, k, n), dtype=jnp.uint64)


def flatten(ct: jnp.ndarray) -> jnp.ndarray:
    return ct.reshape(*ct.shape[:-3], -1)


def ntt_forward(ct: jnp.ndarray) -> jnp.ndarray:
    return poly.ntt_fw(ct)
