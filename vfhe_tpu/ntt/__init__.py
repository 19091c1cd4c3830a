from .params import get_params, bit_reverse_index, bit_reverse_permutation
from .ntt import ntt_forward, ntt_backward, negacyclic_mul

__all__ = [
    "get_params", "bit_reverse_index", "bit_reverse_permutation",
    "ntt_forward", "ntt_backward", "negacyclic_mul",
]
