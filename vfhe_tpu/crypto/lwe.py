"""Native LWE layer (ref: src/vtfhe/crypto/lwe.rs).

Ciphertexts are ``(..., n+1)`` uint64 arrays ``[mask_0..mask_{n-1}, body]``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from .poly import rand_error


def log2_ceil(x: int) -> int:
    """ceil(log2(x)) — matches plonky2's util::log2_ceil used by the ref."""
    return (x - 1).bit_length()


def inner_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum_i a_i b_i over the last axis (ref: lwe.rs:4-8)."""
    prods = gl.mul(a, b)

    def body(carry, x):
        return gl.add(carry, x), None

    out, _ = jax.lax.scan(body, jnp.zeros(prods.shape[:-1], jnp.uint64),
                          jnp.moveaxis(prods, -1, 0))
    return out


def key_gen(key, n: int) -> jnp.ndarray:
    """Binary LWE key (ref: lwe.rs:10-14)."""
    return gl.rand_bits(key, (n,))


def get_delta(p: int) -> int:
    """Delta = q >> ceil(log2 p) (ref: lwe.rs:46-48)."""
    return gl.P >> log2_ceil(p)


def encrypt(key, s: jnp.ndarray, m, sigma: float) -> jnp.ndarray:
    """(ref: lwe.rs:50-59). ``m`` is a scalar field element."""
    n = s.shape[-1]
    k_mask, k_err = jax.random.split(key)
    mask = gl.rand(k_mask, (n,))
    e = rand_error(k_err, (), sigma)
    body = gl.add(gl.add(inner_product(s, mask), jnp.uint64(m)), e)
    return jnp.concatenate([mask, body[None]])


def decrypt(s: jnp.ndarray, ct: jnp.ndarray) -> jnp.ndarray:
    """Noisy decryption (ref: lwe.rs:62-69)."""
    return gl.sub(ct[..., -1], inner_product(s, ct[..., :-1]))


def mod_switch_element(element, p: int):
    """Round a field element onto Z_{2p}: top log2_ceil(p)+1 bits with a
    rounding carry from the next bit (ref: lwe.rs:28-34)."""
    shift = jnp.asarray(element, jnp.uint64) >> jnp.uint64(64 - log2_ceil(p) - 2)
    carry = shift & jnp.uint64(1)
    return (shift >> jnp.uint64(1)) + carry


def mod_switch_ct(ct: jnp.ndarray, p: int) -> jnp.ndarray:
    """(ref: lwe.rs:36-38)."""
    return mod_switch_element(ct, p)


def get_error(ct: jnp.ndarray, s: jnp.ndarray, m) -> float:
    """Relative error |decrypt - m| / q (ref: lwe.rs:16-26)."""
    mbar = int(decrypt(s, ct))
    m = int(m)
    diff = abs(mbar - m)
    return min(diff, gl.P - diff) / gl.P
