"""Quadratic extension F_{q^2} = F_q[x] / (x^2 - 7).

The reference instantiates plonky2 with extension degree D = 2
(src/main.rs:33); FRI soundness lives in this extension. plonky2's
``QuadraticExtension<GoldilocksField>`` uses W = 7 (the field's
multiplicative generator) as the non-residue; we match that so
challenge arithmetic is directly comparable.

Elements are represented as a trailing axis of size 2: ``(..., 2)``
uint64 arrays ``[c0, c1]`` meaning c0 + c1*x.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import goldilocks as gl

W = 7  # x^2 = W
# DTH_ROOT = W^((q-1)/2): used for Frobenius, kept for parity with plonky2.
DTH_ROOT = pow(W, (gl.P - 1) // 2, gl.P)


def from_base(a: jnp.ndarray) -> jnp.ndarray:
    """Lift base-field array (...,) to extension array (..., 2)."""
    return jnp.stack([a, jnp.zeros_like(a)], axis=-1)


def scalar(c0: int, c1: int = 0) -> jnp.ndarray:
    return jnp.array([c0 % gl.P, c1 % gl.P], dtype=jnp.uint64)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return gl.add(a, b)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return gl.sub(a, b)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return gl.neg(a)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a0 + a1 x)(b0 + b1 x) = a0 b0 + W a1 b1 + (a0 b1 + a1 b0) x."""
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    w = jnp.uint64(W)
    c0 = gl.add(gl.mul(a0, b0), gl.mul(w, gl.mul(a1, b1)))
    c1 = gl.add(gl.mul(a0, b1), gl.mul(a1, b0))
    return jnp.stack([c0, c1], axis=-1)


def mul_base(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Extension (..., 2) times base-field (...,) scalar."""
    return gl.mul(a, b[..., None])


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    e = int(e)
    if e == 0:
        out = jnp.zeros_like(a)
        return out.at[..., 0].set(1)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse via the norm: (a0 + a1 x)^-1 = conj(a) / (a0^2 - W a1^2)."""
    a0, a1 = a[..., 0], a[..., 1]
    w = jnp.uint64(W)
    norm = gl.sub(gl.square(a0), gl.mul(w, gl.square(a1)))
    ninv = gl.inv(norm)
    return jnp.stack([gl.mul(a0, ninv), gl.mul(gl.neg(a1), ninv)], axis=-1)


def frobenius(a: jnp.ndarray) -> jnp.ndarray:
    """x -> DTH_ROOT * x (the q-power Frobenius automorphism)."""
    return jnp.stack([a[..., 0], gl.mul(a[..., 1], jnp.uint64(DTH_ROOT))],
                     axis=-1)
