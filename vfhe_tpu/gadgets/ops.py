"""vtfhe circuit ops: selects, witness-dependent rotation, CMUX step,
key switch (ref: src/vtfhe/mod.rs:31-136)."""

from __future__ import annotations

import numpy as np

from .glwe_ct import GlweCt
from .glwe_poly import GlwePoly
from .lev_ct import LevCt
from .vec_arithmetic import vec_add, vec_add_many


def log2_ceil(x: int) -> int:
    return (x - 1).bit_length()


def poly_select(b, control: int, left: GlwePoly, right: GlwePoly) -> GlwePoly:
    """(ref: vtfhe/mod.rs:56-66). One shared control for the whole poly
    -> CSEL gate lanes (3 wires/lane vs SELECT's 4)."""
    return GlwePoly(b.csel_vec(control, left.coeffs, right.coeffs))


def glwe_select(b, control: int, left: GlweCt, right: GlweCt) -> GlweCt:
    """(ref: vtfhe/mod.rs:68-78)."""
    return GlweCt([poly_select(b, control, l, r)
                   for l, r in zip(left.polys, right.polys)])


def rotate_poly(b, poly: GlwePoly, shift: int) -> GlwePoly:
    """Witness-dependent negacyclic rotation with in-circuit mod switch
    (ref: vtfhe/mod.rs:80-107).

    Splits the 64-bit shift target; the top log2(N)+1 bits are the
    rotation amount mod 2N, with a rounding carry from the next bit; then
    a barrel shifter of log2(N)+1 rotate+select stages.
    """
    n = poly.n
    log2n = log2_ceil(n) + 1
    bits = b.split_le_vec(np.array([shift]), 64)[0]   # (64,) bit targets

    def stage(cur: GlwePoly, bit, shift: int) -> GlwePoly:
        # out = bit ? rotate(cur, shift) : cur, with the negacyclic wrap
        # negation FUSED into the select (CSEL neg lanes): rotated
        # position i<shift sources -cur[n-shift+i], the rest cur[i-shift]
        c = cur.coeffs
        if shift == n:           # full wrap: pure negation select
            return GlwePoly(b.csel_vec(bit, c, c, neg=True))
        wrap = b.csel_vec(bit, c[n - shift:], c[:shift], neg=True)
        rest = b.csel_vec(bit, c[:n - shift], c[shift:], neg=False)
        return GlwePoly(np.concatenate([wrap, rest]))

    # rounding: rotate by 1 iff bit just below the mod-switch window is set
    current = stage(poly, bits[64 - log2n - 1], 1)
    for log_shift, bit in enumerate(bits[64 - log2n:]):
        current = stage(current, bit, 1 << log_shift)
    return current


def rotate_glwe(b, glwe: GlweCt, shift: int) -> GlweCt:
    """(ref: vtfhe/mod.rs:109-117)."""
    return GlweCt([rotate_poly(b, p, shift) for p in glwe.polys])


def blind_rotation_step(b, glwe: GlweCt, ggsw, mask_element: int,
                        logb: int) -> GlweCt:
    """CMUX: acc + GGSW x (X^a * acc - acc) (ref: vtfhe/mod.rs:119-136)."""
    shifted = rotate_glwe(b, glwe, mask_element)
    diff = shifted.sub(b, glwe)
    return ggsw.external_product(b, diff, logb).add(b, glwe)


def key_switch(b, glwe_ct: GlweCt, ksk: list, logb: int) -> np.ndarray:
    """LevCt-route key switch with built-in sample extraction
    (ref: vtfhe/mod.rs:31-54). ``ksk`` is a list of N LevCts; assumes the
    ksk encrypts -s_i so the result is a plain sum."""
    n_lwe = ksk[0].lwe_cts.shape[1]
    body = glwe_ct.polys[-1].coeffs
    summands = [lev.mul(b, int(mask), logb)
                for mask, lev in zip(body, ksk)]
    total = vec_add_many(b, summands)
    init = np.full(n_lwe, b.zero(), dtype=np.int64)
    init[-1] = glwe_ct.polys[-1].coeffs[0]
    return vec_add(b, init, total)
