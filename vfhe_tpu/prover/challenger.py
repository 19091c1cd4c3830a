"""Fiat-Shamir transcript: a Poseidon duplex sponge.

Rebuild of plonky2's ``Challenger`` (drives every challenge the
reference's prover/verifier derive: permutation betas/gammas, quotient
alphas, the opening point zeta, FRI fold challenges and query indices).
Host-side object with tiny device permutes; both prover and verifier run
the identical sequence, so transcripts agree by construction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..hashing import constants as C
from ..hashing import poseidon as H


class Challenger:
    def __init__(self):
        self._state = np.zeros(C.WIDTH, dtype=np.uint64)
        self._inputs: list[int] = []
        self._outputs: list[int] = []

    # -- observing ---------------------------------------------------------

    def observe(self, elements) -> None:
        arr = np.atleast_1d(np.asarray(elements, dtype=np.uint64)).ravel()
        self._outputs.clear()
        self._inputs.extend(int(x) for x in arr)

    def observe_cap(self, cap) -> None:
        self.observe(np.asarray(cap, dtype=np.uint64).ravel())

    def observe_ext(self, x) -> None:
        self.observe(np.asarray(x, dtype=np.uint64).ravel())

    # -- sampling ----------------------------------------------------------

    def _duplex(self) -> None:
        # overwrite-absorb pending inputs in rate-sized chunks, then refill
        # the output buffer from the rate part of the state
        pending = self._inputs
        if pending:
            for start in range(0, len(pending), C.RATE):
                chunk = pending[start:start + C.RATE]
                self._state[:len(chunk)] = np.array(chunk, dtype=np.uint64)
                self._permute()
            self._inputs = []
        else:
            self._permute()
        self._outputs = [int(x) for x in self._state[:C.RATE]][::-1]

    def _permute(self) -> None:
        self._state = np.array(H.permute_host(self._state.tolist()),
                               dtype=np.uint64)

    def sample(self) -> int:
        if not self._outputs:
            self._duplex()
        return self._outputs.pop()

    def sample_array(self, n: int) -> np.ndarray:
        return np.array([self.sample() for _ in range(n)], dtype=np.uint64)

    def sample_ext(self) -> np.ndarray:
        return self.sample_array(2)

    def sample_indices(self, n_bits: int, count: int) -> np.ndarray:
        """Query positions: low bits of sampled elements (plonky2-style)."""
        return np.array([self.sample() & ((1 << n_bits) - 1)
                         for _ in range(count)], dtype=np.int64)
