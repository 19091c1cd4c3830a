"""GlwePoly gadget + signed decomposition (ref: src/vtfhe/glwe_poly.rs).

A GlwePoly wraps an (N,) array of targets. The signed base-2^LOGB
decomposition follows the reference bit-for-bit (glwe_poly.rs:28-50):
center by the top bit, split the centered lift, per-limb le_sum with a
carry/balancer so limbs lie in [-B/2, B/2], and flip signs back —
vectorized over all coefficients at once.
"""

from __future__ import annotations

import numpy as np

from .ntt_gadget import ntt_backward as _ntt_bw_gadget


def plus_or_minus_vec(b, sgn, x) -> np.ndarray:
    """select(sgn, -x, x) per lane (ref: glwe_poly.rs:17-24)."""
    x = np.asarray(x)
    return b.select_vec(sgn, b.neg_vec(x), x)


def decompose_vec(b, xs, logb: int, num_limbs: int) -> np.ndarray:
    """Signed decomposition of (L,) targets -> (num_limbs, L) limb targets
    (ref: glwe_poly.rs:28-50).

    When ``num_limbs * logb > 64`` the sign bit the reference reads is
    bit >= 64 of a canonical 64-bit value — STATICALLY zero (the CANON
    split row pins bits past 63 to zero; crypto/ggsw.signed_decompose
    notes the same for the native model). The whole sign path (a second
    full split of x plus a select+neg per coefficient and per limb) is
    dead weight then, so it is skipped: at paper params (LOGB=5 -> 13
    limbs, 65 bits) this removes ~4.9k rows (~16%) from the step
    circuit with bit-identical limb values."""
    xs = np.asarray(xs)
    L = xs.size
    nbits = num_limbs * logb
    signed = nbits <= 64          # sign bit can actually be set
    if signed:
        bits = b.split_le_vec(xs, nbits)
        sgn = bits[:, -1]
        x_centered = plus_or_minus_vec(b, sgn, xs)
    else:
        x_centered = xs
    # split + balanced-limb recombination in ONE row (DECOMP gate): the
    # carry/balancer chain is linear in the row's own bits
    _, balanced = b.split_le_limbs_vec(x_centered, logb, num_limbs)
    if not signed:
        return np.stack(list(balanced), axis=0)
    return np.stack([plus_or_minus_vec(b, sgn, balanced[i])
                     for i in range(num_limbs)], axis=0)


def decompose(b, x: int, logb: int, num_limbs: int) -> np.ndarray:
    """Scalar form (one target -> num_limbs targets)."""
    return decompose_vec(b, np.array([x]), logb, num_limbs)[:, 0]


class GlwePoly:
    """(ref: glwe_poly.rs:53-176)."""

    def __init__(self, coeffs: np.ndarray):
        self.coeffs = np.asarray(coeffs, dtype=np.int64)

    @classmethod
    def new_from_builder(cls, b, n: int) -> "GlwePoly":
        return cls(b.add_virtual_targets(n))

    @classmethod
    def new_from_targets(cls, targets) -> "GlwePoly":
        return cls(np.asarray(targets))

    @property
    def n(self) -> int:
        return self.coeffs.size

    def flatten(self) -> np.ndarray:
        return self.coeffs.copy()

    def register(self, b) -> None:
        b.register_public_inputs(self.coeffs)

    def assign(self, pw, values) -> None:
        pw.set_target_arr(self.coeffs, values)

    def add(self, b, other: "GlwePoly") -> "GlwePoly":
        return GlwePoly(b.add_vec(self.coeffs, other.coeffs))

    def sub(self, b, other: "GlwePoly") -> "GlwePoly":
        return GlwePoly(b.sub_vec(self.coeffs, other.coeffs))

    def ntt_backward(self, b) -> "GlwePoly":
        return GlwePoly(_ntt_bw_gadget(b, self.coeffs))

    def rotate(self, b, shift: int) -> "GlwePoly":
        """Static negacyclic rotation by ``shift`` in [0, N]: pure rewiring
        plus negation of the wrapped coefficients (ref: glwe_poly.rs:127-142).
        """
        n = self.n
        assert 0 <= shift <= n
        if shift == 0:
            return GlwePoly(self.coeffs.copy())
        wrapped = b.neg_vec(self.coeffs[n - shift:])
        return GlwePoly(np.concatenate([wrapped, self.coeffs[:n - shift]]))

    def decompose(self, b, logb: int, num_limbs: int) -> np.ndarray:
        """All coefficients at once -> (num_limbs, N) targets
        (ref: glwe_poly.rs:144-160)."""
        return decompose_vec(b, self.coeffs, logb, num_limbs)

    @staticmethod
    def num_targets(n: int) -> int:
        return n
