"""In-circuit verifier building blocks (recursion groundwork).

The reference's IVC verifies the previous step proof *inside* the step
circuit via plonky2's cyclic recursion (ivc_based_vpbs.rs:268-273);
SURVEY.md section 7 ranks the in-circuit FRI verifier as the hardest
build stage. This module provides the tested primitives that verifier is
assembled from:

* RecursiveChallenger — the Fiat-Shamir duplex sponge over in-circuit
  Poseidon, transcript-compatible with prover/verifier Challenger;
* verify_merkle_path_circuit — Merkle cap membership with a *dynamic*
  (bit-target-driven) index: per-level left/right steering and the final
  cap lookup are select ladders;
* (vfhe_tpu.gadgets.extension) — extension-field target arithmetic.

The full in-circuit PLONK/FRI verifier composes these (next round).
"""

from __future__ import annotations

import numpy as np

from ..circuit.builder import CircuitBuilder


class RecursiveChallenger:
    """In-circuit duplex sponge mirroring prover/challenger.Challenger:
    same absorb (overwrite, rate 8) and squeeze schedule, so sampled
    targets carry the same values as the native transcript."""

    def __init__(self, b: CircuitBuilder):
        self.b = b
        self._state = np.full(12, b.zero(), dtype=np.int64)
        self._inputs: list[int] = []
        self._outputs: list[int] = []

    def observe(self, targets) -> None:
        arr = np.atleast_1d(np.asarray(targets, dtype=np.int64)).ravel()
        self._outputs.clear()
        self._inputs.extend(int(t) for t in arr)

    def _duplex(self) -> None:
        b = self.b
        if self._inputs:
            pending = np.array(self._inputs, dtype=np.int64)
            # overwrite-absorb all pending chunks in ONE batched sponge op
            # (the openings absorb alone is ~70 sequential permutations)
            self._state = b.sponge_vec(pending[None, :],
                                       init_state=self._state[None, :])[0]
            self._inputs = []
        else:
            self._state = self.b.poseidon_vec(self._state[None, :])[0]
        self._outputs = [int(t) for t in self._state[:8]][::-1]

    def sample(self) -> int:
        if not self._outputs:
            self._duplex()
        return self._outputs.pop()

    def sample_array(self, n: int) -> np.ndarray:
        return np.array([self.sample() for _ in range(n)], dtype=np.int64)

    def sample_ext(self) -> np.ndarray:
        return self.sample_array(2)


def two_to_one_circuit(b: CircuitBuilder, left, right) -> np.ndarray:
    """Poseidon compression of two 4-target digests (plonky2 compress)."""
    state = np.concatenate([np.asarray(left, dtype=np.int64),
                            np.asarray(right, dtype=np.int64),
                            np.full(4, b.zero(), dtype=np.int64)])
    return b.poseidon_vec(state[None, :])[0][:4]


def verify_merkle_path_circuit(b: CircuitBuilder, leaf, index_bits,
                               siblings, cap) -> None:
    """Constrain: hashing ``leaf`` up the path ``siblings`` (steered by the
    little-endian ``index_bits`` targets) lands on the cap entry selected
    by the remaining bits.

    leaf: (W,) targets; index_bits: (n_levels + cap_bits,) bool targets;
    siblings: (n_levels, 4) targets; cap: (2^cap_bits, 4) targets.
    """
    leaf = np.asarray(leaf, dtype=np.int64)
    siblings = np.asarray(siblings, dtype=np.int64)
    cap = np.asarray(cap, dtype=np.int64)
    n_levels = siblings.shape[0]
    cap_bits = int(np.log2(cap.shape[0])) if cap.shape[0] > 1 else 0
    assert len(index_bits) == n_levels + cap_bits

    digest = b.hash_n_to_hash_no_pad(leaf)
    for lvl in range(n_levels):
        bit = index_bits[lvl]
        sib = siblings[lvl]
        # bit == 1 -> we are the right child: left = sib, right = digest
        left = b.select_vec(np.full(4, bit), sib, digest)
        right = b.select_vec(np.full(4, bit), digest, sib)
        digest = two_to_one_circuit(b, left, right)

    # cap lookup by the top bits: a select reduction tree
    entries = [cap[i] for i in range(cap.shape[0])]
    for bi in range(cap_bits):
        bit = index_bits[n_levels + bi]
        entries = [b.select_vec(np.full(4, bit), entries[2 * i + 1],
                                entries[2 * i])
                   for i in range(len(entries) // 2)]
    b.connect_vec(digest, entries[0])
