from . import constants, poseidon
from .poseidon import (hash_no_pad, permute, two_to_one, hash_chain,
                       zero_digest, HASH_OUT_ELTS)

__all__ = ["constants", "poseidon", "hash_no_pad", "permute", "two_to_one",
           "hash_chain", "zero_digest", "HASH_OUT_ELTS"]
