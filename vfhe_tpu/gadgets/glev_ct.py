"""GlevCt gadget + gadget product (ref: src/vtfhe/glev_ct.rs).

``mul`` implements the gadget product: decompose the input poly into
ceil(64/LOGB) limbs, keep the TOP ELL (glev_ct.rs:97-99), forward-NTT
them (one batched gadget call), then per GLWE column take the inner
product with the stored NTT-domain rows.
"""

from __future__ import annotations

import math

import numpy as np

from .glwe_ct import GlweCt
from .glwe_poly import GlwePoly
from .ntt_gadget import ntt_forward as _ntt_fw
from .vec_arithmetic import vec_inner


class GlevCt:
    def __init__(self, glwe_cts: list):
        self.glwe_cts = list(glwe_cts)

    @classmethod
    def new_from_builder(cls, b, n: int, k: int, ell: int) -> "GlevCt":
        return cls([GlweCt.new_from_builder(b, n, k) for _ in range(ell)])

    @classmethod
    def new_from_targets(cls, targets, n: int, k: int, ell: int) -> "GlevCt":
        t = np.asarray(targets).reshape(ell, k * n)
        return cls([GlweCt.new_from_targets(t[i], n, k) for i in range(ell)])

    @property
    def ell(self) -> int:
        return len(self.glwe_cts)

    def flatten(self) -> np.ndarray:
        return np.concatenate([g.flatten() for g in self.glwe_cts])

    def register(self, b) -> None:
        for g in self.glwe_cts:
            g.register(b)

    def assign(self, pw, ct) -> None:
        """ct: native (ELL, K, N) array."""
        ct = np.asarray(ct)
        for g, vals in zip(self.glwe_cts, ct):
            g.assign(pw, vals)

    def get_row(self, index: int) -> list:
        """(ref: glev_ct.rs:80-86)."""
        return [g.polys[index].coeffs for g in self.glwe_cts]

    @staticmethod
    def num_targets(n: int, k: int, ell: int) -> int:
        return k * n * ell

    def mul(self, b, poly: GlwePoly, logb: int) -> GlweCt:
        """Gadget product (ref: glev_ct.rs:92-110). Returns an NTT-domain
        GlweCt."""
        n = poly.n
        k = self.glwe_cts[0].k
        num_limbs = math.ceil(64 / logb)
        limbs = poly.decompose(b, logb, num_limbs)       # (num_limbs, N)
        top = limbs[num_limbs - self.ell:]               # (ELL, N)
        limbs_hat = _ntt_fw(b, top)                      # batched over ELL
        polys = []
        for index in range(k):
            coeffs = vec_inner(b, list(limbs_hat), self.get_row(index))
            polys.append(GlwePoly(coeffs))
        return GlweCt(polys)
