"""Batched negacyclic NTT over Goldilocks as vectorized JAX stages.

Semantics are bit-exact with the reference's iterative radix-2
Cooley-Tukey / Gentleman-Sande pair (circuit version src/ntt/mod.rs:12-70,
native version src/vtfhe/crypto/poly.rs:9-64): LOGN stages, stage ``m``
reads bit-reversed twiddles at [m..2m), and the backward transform ends
with a multiply by NINV.

TPU-first re-design: instead of the reference's scalar double loop, each
stage is one reshape to (..., m, 2, t) plus a fused vector
multiply/add/sub over the whole batch, so a batch of polynomials (e.g.
all K*ELL decomposition limbs of a step, or many ciphertexts) runs as a
handful of wide VPU ops. The stage loop is a static Python loop
(LOGN <= 11), fully unrolled under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from .params import get_params


def _fw_stage(a: jnp.ndarray, roots: jnp.ndarray, m: int) -> jnp.ndarray:
    """One forward butterfly stage (ref: src/ntt/mod.rs:12-28)."""
    n = a.shape[-1]
    t = n // (2 * m)
    batch = a.shape[:-1]
    a = a.reshape(*batch, m, 2, t)
    u = a[..., 0, :]
    s = roots[m:2 * m][:, None]  # (m, 1) broadcasts over t and batch dims
    v = gl.mul(a[..., 1, :], s)
    out = jnp.stack([gl.add(u, v), gl.sub(u, v)], axis=-2)
    return out.reshape(*batch, n)


def _bw_stage(a: jnp.ndarray, invroots: jnp.ndarray, m: int) -> jnp.ndarray:
    """One backward (Gentleman-Sande) stage (ref: src/ntt/mod.rs:41-59)."""
    n = a.shape[-1]
    t = n // (2 * m)
    batch = a.shape[:-1]
    a = a.reshape(*batch, m, 2, t)
    u = a[..., 0, :]
    v = a[..., 1, :]
    s = invroots[m:2 * m][:, None]
    out = jnp.stack([gl.add(u, v), gl.mul(gl.sub(u, v), s)], axis=-2)
    return out.reshape(*batch, n)


@jax.jit
def ntt_forward(a: jnp.ndarray) -> jnp.ndarray:
    """Negacyclic forward NTT along the last axis. Batched over leading dims."""
    n = a.shape[-1]
    p = get_params(n)
    roots = jnp.asarray(p.roots)
    for logm in range(p.logn):
        a = _fw_stage(a, roots, 1 << logm)
    return a


@jax.jit
def ntt_backward(a: jnp.ndarray) -> jnp.ndarray:
    """Negacyclic inverse NTT along the last axis (includes the 1/N scale)."""
    n = a.shape[-1]
    p = get_params(n)
    invroots = jnp.asarray(p.invroots)
    for logm in reversed(range(p.logn)):
        a = _bw_stage(a, invroots, 1 << logm)
    return gl.mul(a, jnp.uint64(p.ninv))


@jax.jit
def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Polynomial product in F_q[X]/(X^N + 1) (ref: crypto/poly.rs:146-150)."""
    return ntt_backward(gl.mul(ntt_forward(a), ntt_forward(b)))
