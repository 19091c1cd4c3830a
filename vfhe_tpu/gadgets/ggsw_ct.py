"""GgswCt gadget + external product (ref: src/vtfhe/ggsw_ct.rs)."""

from __future__ import annotations

import numpy as np

from .glev_ct import GlevCt
from .glwe_ct import GlweCt
from .glwe_poly import GlwePoly


def glwe_add_many(b, glwes: list) -> GlweCt:
    """(ref: ggsw_ct.rs:12-29)."""
    acc = glwes[0]
    for g in glwes[1:]:
        acc = acc.add(b, g)
    return acc


class GgswCt:
    def __init__(self, glev_cts: list):
        self.glev_cts = list(glev_cts)

    @classmethod
    def new_from_builder(cls, b, n: int, k: int, ell: int) -> "GgswCt":
        return cls([GlevCt.new_from_builder(b, n, k, ell) for _ in range(k)])

    @classmethod
    def new_from_targets(cls, targets, n: int, k: int, ell: int) -> "GgswCt":
        t = np.asarray(targets).reshape(k, ell * k * n)
        return cls([GlevCt.new_from_targets(t[i], n, k, ell)
                    for i in range(k)])

    def flatten(self) -> np.ndarray:
        return np.concatenate([g.flatten() for g in self.glev_cts])

    def register(self, b) -> None:
        for g in self.glev_cts:
            g.register(b)

    def assign(self, pw, ct) -> None:
        """ct: native (K, ELL, K, N) array (NTT domain for keys)."""
        ct = np.asarray(ct)
        for g, vals in zip(self.glev_cts, ct):
            g.assign(pw, vals)

    @staticmethod
    def num_targets(n: int, k: int, ell: int) -> int:
        return k * k * n * ell

    def external_product(self, b, glwe: GlweCt, logb: int) -> GlweCt:
        """GGSW (NTT domain) x GLWE with the reference's sign convention
        result = glev_muls[K-1] - sum_{i<K-1} glev_muls[i], then iNTT
        (ref: ggsw_ct.rs:98-112)."""
        k = len(self.glev_cts)
        muls = [glev.mul(b, poly, logb)
                for poly, glev in zip(glwe.polys, self.glev_cts)]
        if k > 1:
            sum_polys = glwe_add_many(b, muls[:k - 1])
            out = muls[k - 1].sub(b, sum_polys)
        else:
            out = muls[0]
        return out.ntt_backward(b)
