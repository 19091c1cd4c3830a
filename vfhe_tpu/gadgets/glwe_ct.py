"""GlweCt gadget: K polys of targets (ref: src/vtfhe/glwe_ct.rs)."""

from __future__ import annotations

import numpy as np

from .glwe_poly import GlwePoly
from .ntt_gadget import ntt_backward as _ntt_bw


class GlweCt:
    def __init__(self, polys: list):
        self.polys = list(polys)

    @classmethod
    def new_from_builder(cls, b, n: int, k: int) -> "GlweCt":
        return cls([GlwePoly.new_from_builder(b, n) for _ in range(k)])

    @classmethod
    def new_from_targets(cls, targets, n: int, k: int) -> "GlweCt":
        t = np.asarray(targets).reshape(k, n)
        return cls([GlwePoly(t[i]) for i in range(k)])

    @property
    def k(self) -> int:
        return len(self.polys)

    @property
    def n(self) -> int:
        return self.polys[0].n

    def flatten(self) -> np.ndarray:
        return np.concatenate([p.coeffs for p in self.polys])

    def register(self, b) -> None:
        for p in self.polys:
            p.register(b)

    def assign(self, pw, ct) -> None:
        """ct: native (K, N) array (vfhe_tpu.crypto.glwe layout)."""
        ct = np.asarray(ct)
        for p, vals in zip(self.polys, ct):
            p.assign(pw, vals)

    def add(self, b, other: "GlweCt") -> "GlweCt":
        return GlweCt([p.add(b, q) for p, q in zip(self.polys, other.polys)])

    def sub(self, b, other: "GlweCt") -> "GlweCt":
        return GlweCt([p.sub(b, q) for p, q in zip(self.polys, other.polys)])

    def ntt_backward(self, b) -> "GlweCt":
        # one batched gadget call for all K polys (ref does K separate
        # passes, glwe_ct.rs:98-111 — same circuit, fewer ledger entries)
        stacked = np.stack([p.coeffs for p in self.polys])
        out = _ntt_bw(b, stacked)
        return GlweCt([GlwePoly(out[i]) for i in range(len(self.polys))])

    @staticmethod
    def num_targets(n: int, k: int) -> int:
        return k * n
