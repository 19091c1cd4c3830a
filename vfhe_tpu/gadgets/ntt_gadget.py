"""In-circuit negacyclic NTT gadgets (ref: src/ntt/mod.rs:12-70).

Identical butterfly structure and twiddle indexing as the reference's
circuit NTT (and our native kernel vfhe_tpu.ntt), expressed as builder
vector ops: each stage contributes TWO ledger entries (a constant-mul
lane batch and add/sub batches) regardless of N — the TPU-native answer
to the reference's per-butterfly gate emission.

Batch-aware: ``x`` may be (..., N) target arrays; all leading axes ride
along (e.g. all ELL decomposition limbs of a GLWE poly at once).
"""

from __future__ import annotations

import numpy as np

from ..field.goldilocks import P as gl_P
from ..ntt.params import get_params


def ntt_forward(b, x: np.ndarray) -> np.ndarray:
    """(..., N) targets -> (..., N) targets (ref: ntt/mod.rs:30-38)."""
    x = np.asarray(x, dtype=np.int64)
    n = x.shape[-1]
    p = get_params(n)
    batch = x.shape[:-1]
    for logm in range(p.logn):
        m = 1 << logm
        t = n // (2 * m)
        xr = x.reshape(*batch, m, 2, t)
        u = xr[..., 0, :].reshape(-1)
        vsrc = xr[..., 1, :].reshape(-1)
        roots = np.broadcast_to(p.roots[m:2 * m, None], (*batch, m, t))
        s_ts = np.broadcast_to(b.constants(p.roots[m:2 * m]),
                               (*batch, m))[..., None]
        s_ts = np.broadcast_to(s_ts, (*batch, m, t)).reshape(-1)
        # fused butterflies: u + s*x and u - s*x as single arith lanes
        new0 = b._arith_vec(1, 1, s_ts, vsrc, u)
        new1 = b._arith_vec(gl_P - 1, 1, s_ts, vsrc, u)
        x = np.stack([new0.reshape(*batch, m, t),
                      new1.reshape(*batch, m, t)], axis=-2).reshape(*batch, n)
    return x


def ntt_backward(b, x: np.ndarray) -> np.ndarray:
    """(..., N) targets -> (..., N) targets, with the final NINV scale
    (ref: ntt/mod.rs:41-70)."""
    x = np.asarray(x, dtype=np.int64)
    n = x.shape[-1]
    p = get_params(n)
    batch = x.shape[:-1]
    for logm in reversed(range(p.logn)):
        m = 1 << logm
        t = n // (2 * m)
        xr = x.reshape(*batch, m, 2, t)
        u = xr[..., 0, :].reshape(-1)
        v = xr[..., 1, :].reshape(-1)
        new0 = b.add_vec(u, v)
        diff = b.sub_vec(u, v)
        invroots = np.broadcast_to(p.invroots[m:2 * m, None], (*batch, m, t))
        new1 = b.mul_const_vec(invroots.ravel(), diff)
        x = np.stack([new0.reshape(*batch, m, t),
                      new1.reshape(*batch, m, t)], axis=-2).reshape(*batch, n)
    return b.mul_const_vec(np.full(x.size, p.ninv, dtype=np.uint64),
                           x.ravel()).reshape(*batch, n)
