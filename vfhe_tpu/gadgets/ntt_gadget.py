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
    """(..., N) targets -> (..., N) targets (ref: ntt/mod.rs:30-38).

    Consecutive stage pairs (m, 2m) are emitted as RADIX-4 lanes
    (builder.ntt_butterfly4_vec, one constant-column twiddle per lane —
    half the rows of radix-2); an odd final stage falls back to the
    radix-2 NTTBF gate. Bit-exact with the reference's radix-2 chain:
    the lane algebra composes the same two butterflies exactly."""
    x = np.asarray(x, dtype=np.int64)
    n = x.shape[-1]
    p = get_params(n)
    batch = x.shape[:-1]
    logm = 0
    while logm + 1 < p.logn:
        m = 1 << logm
        t2 = n // (4 * m)
        xr = x.reshape(*batch, m, 2, 2, t2)
        A = xr[..., 0, 0, :].reshape(-1)
        B = xr[..., 0, 1, :].reshape(-1)
        C = xr[..., 1, 0, :].reshape(-1)
        D = xr[..., 1, 1, :].reshape(-1)
        # one constant per lane: s = roots[2m + 2g] (w = s^2, odd = J*s)
        s4 = np.broadcast_to(p.roots[2 * m:4 * m:2, None],
                             (*batch, m, t2)).reshape(-1)
        o0, o1, o2, o3 = b.ntt_butterfly4_vec(A, B, C, D, s4)
        sh = (*batch, m, t2)
        x = np.stack([np.stack([o0.reshape(sh), o1.reshape(sh)], axis=-2),
                      np.stack([o2.reshape(sh), o3.reshape(sh)], axis=-2)],
                     axis=-3).reshape(*batch, n)
        logm += 2
    if logm < p.logn:                       # odd LOGN: radix-2 leftover
        m = 1 << logm
        t = n // (2 * m)
        xr = x.reshape(*batch, m, 2, t)
        u = xr[..., 0, :].reshape(-1)
        vsrc = xr[..., 1, :].reshape(-1)
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
    logm = p.logn - 1
    while logm >= 1:                        # radix-4: stages (2m, m)
        m = 1 << (logm - 1)
        t2 = n // (4 * m)
        xr = x.reshape(*batch, m, 2, 2, t2)
        A = xr[..., 0, 0, :].reshape(-1)    # group 2g, half 0
        B = xr[..., 0, 1, :].reshape(-1)    # group 2g, half 1
        C = xr[..., 1, 0, :].reshape(-1)    # group 2g+1, half 0
        D = xr[..., 1, 1, :].reshape(-1)    # group 2g+1, half 1
        s4 = np.broadcast_to(p.invroots[2 * m:4 * m:2, None],
                             (*batch, m, t2)).reshape(-1)
        o0, o1, o2, o3 = b.ntt_butterfly4_vec(A, B, C, D, s4,
                                              inverse=True)
        sh = (*batch, m, t2)
        x = np.stack([np.stack([o0.reshape(sh), o1.reshape(sh)], axis=-2),
                      np.stack([o2.reshape(sh), o3.reshape(sh)], axis=-2)],
                     axis=-3).reshape(*batch, n)
        logm -= 2
    if logm == 0:                           # odd LOGN: radix-2 leftover
        m = 1
        t = n // 2
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
