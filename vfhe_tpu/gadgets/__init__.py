from .glwe_poly import GlwePoly, decompose, decompose_vec, plus_or_minus_vec
from .glwe_ct import GlweCt
from .glev_ct import GlevCt
from .ggsw_ct import GgswCt, glwe_add_many
from .lev_ct import LevCt
from . import ntt_gadget, vec_arithmetic
from .ops import (poly_select, glwe_select, rotate_poly, rotate_glwe,
                  blind_rotation_step, key_switch)

__all__ = [
    "GlwePoly", "GlweCt", "GlevCt", "GgswCt", "LevCt", "decompose",
    "decompose_vec", "plus_or_minus_vec", "glwe_add_many", "ntt_gadget",
    "vec_arithmetic", "poly_select", "glwe_select", "rotate_poly",
    "rotate_glwe", "blind_rotation_step", "key_switch",
]
