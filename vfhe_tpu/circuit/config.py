"""Circuit / prover configuration.

Replaces the reference's compile-time const-generic parameter threading
(SURVEY.md section 5 "Config / flag system": plonky2's
standard_recursion_config plus hand-edited consts) with a real config
object. Defaults mirror plonky2's standard recursion config where that
makes sense (135-ish wires, 80 routed, rate 1/8, cap 4, 2 challenges,
28 queries, 16 PoW bits).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 132            # 80 routed + poseidon intermediates
    num_routed_wires: int = 80
    num_constants: int = 20         # constant columns (NTTBF: one
    #                                 twiddle per butterfly lane)
    rate_bits: int = 3              # LDE blowup 8x
    cap_height: int = 4
    num_challenges: int = 2         # independent permutation/quotient sets
    quotient_degree_factor: int = 8  # max constraint degree (incl. selector)
    fri_arity_bits: int = 2         # fold arity 4
    fri_num_queries: int = 28
    fri_pow_bits: int = 16
    fri_final_poly_len: int = 32    # stop folding when poly degree <= this

    @property
    def perm_chunk_size(self) -> int:
        # partial-product chunk: Z * prod(chunk) must stay within degree cap
        return self.quotient_degree_factor - 1


STANDARD_CONFIG = CircuitConfig()

# A faster, lower-soundness config for unit tests (fewer queries).
TEST_CONFIG = CircuitConfig(fri_num_queries=12, fri_pow_bits=8,
                            fri_final_poly_len=32)
