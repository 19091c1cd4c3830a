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
        # one NTTBF ledger entry per stage: 20 butterflies/row with the
        # twiddle in a per-lane constant COLUMN (degree-1 constraints,
        # half the lanes of the arithmetic-gate lowering)
        roots = np.broadcast_to(p.roots[m:2 * m, None],
                                (*batch, m, t)).reshape(-1)
        new0, new1 = b.ntt_butterfly_vec(u, vsrc, roots)
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
        invroots = np.broadcast_to(p.invroots[m:2 * m, None],
                                   (*batch, m, t)).reshape(-1)
        new0, new1 = b.ntt_butterfly_vec(u, v, invroots, inverse=True)
        x = np.stack([new0.reshape(*batch, m, t),
                      new1.reshape(*batch, m, t)], axis=-2).reshape(*batch, n)
    return b.mul_const_vec(np.full(x.size, p.ninv, dtype=np.uint64),
                           x.ravel()).reshape(*batch, n)
