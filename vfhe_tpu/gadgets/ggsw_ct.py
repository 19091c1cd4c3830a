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
        (ref: ggsw_ct.rs:98-112).

        The whole NTT-domain accumulation — K glevs x ELL limbs of
        pointwise products, the cross-glev sum AND its signs — is ONE
        signed-DOT lane per output coefficient (K*ELL pairs), instead
        of the reference's per-mul/per-add gate chain."""
        import math
        from .ntt_gadget import ntt_forward as _ntt_fw
        k = len(self.glev_cts)
        hats = []                              # per glev: (ELL, N) targets
        for poly, glev in zip(glwe.polys, self.glev_cts):
            num_limbs = math.ceil(64 / logb)
            limbs = poly.decompose(b, logb, num_limbs)
            top = limbs[num_limbs - glev.ell:]
            hats.append(_ntt_fw(b, top))
        out_polys = []
        for index in range(k):
            lefts, rights, signs = [], [], []
            for i, glev in enumerate(self.glev_cts):
                row = glev.get_row(index)      # ELL coeff vectors
                s = 1 if i == k - 1 else -1
                for l in range(glev.ell):
                    lefts.append(hats[i][l])
                    rights.append(row[l])
                    signs.append(s)
            out_polys.append(GlwePoly(b.dot_vec(lefts, rights, signs)))
        return GlweCt(out_polys).ntt_backward(b)
