"""LevCt gadget: ELL LWE ciphertexts of targets (ref: src/vtfhe/lev_ct.rs).

Used only by the LevCt key-switch route (vtfhe/mod.rs:31-54) — the IVC
path key-switches via a GGSW external product instead (SURVEY.md 3.2
note) — kept for full API parity.
"""

from __future__ import annotations

import math

import numpy as np

from .glwe_poly import decompose
from .vec_arithmetic import scalar_mul, vec_add_many


class LevCt:
    def __init__(self, lwe_cts: np.ndarray):
        self.lwe_cts = np.asarray(lwe_cts, dtype=np.int64)  # (ELL, n)

    @classmethod
    def new_from_builder(cls, b, n: int, ell: int) -> "LevCt":
        return cls(b.add_virtual_targets(ell * n).reshape(ell, n))

    def flatten(self) -> np.ndarray:
        return self.lwe_cts.reshape(-1)

    def register(self, b) -> None:
        for row in self.lwe_cts:
            b.register_public_inputs(row)

    def assign(self, pw, ct) -> None:
        pw.set_target_arr(self.lwe_cts, np.asarray(ct))

    @staticmethod
    def num_targets(n: int, ell: int) -> int:
        return n * ell

    def mul(self, b, mask: int, logb: int) -> np.ndarray:
        """Decompose ``mask`` and sum limb-scaled LWE rows. NOTE: uses the
        BOTTOM ELL limbs (zip truncation in the reference, lev_ct.rs:63-76)
        unlike GlevCt::mul's top-ELL convention."""
        num_limbs = math.ceil(64 / logb)
        limbs = decompose(b, mask, logb, num_limbs)
        summands = [scalar_mul(b, limbs[i], self.lwe_cts[i])
                    for i in range(len(self.lwe_cts))]
        return vec_add_many(b, summands)
