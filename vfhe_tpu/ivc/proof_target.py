"""Proof-as-witness: target layout mirroring prover.Proof.

The reference gets this from plonky2's ``add_virtual_proof_with_pis`` /
``set_proof_with_pis_target`` (ivc_based_vpbs.rs:16, 292, 345); here the
layout is derived from the circuit shape (``ProofShape``) so the
recursive verifier circuit can be built against a *fixed* self-shape
(the cyclic fixpoint, common_data_for_recursion equivalent,
ivc_based_vpbs.rs:30-62).

Everything static about a proof of a circuit with ``h`` rows under a
``CircuitConfig`` is computed here: oracle column counts, Merkle depth
per oracle, FRI layer sizes/shift schedule, final-polynomial length.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field import goldilocks as gl
from ..circuit.config import CircuitConfig


def _log2(n: int) -> int:
    assert n & (n - 1) == 0
    return n.bit_length() - 1


@dataclass(frozen=True)
class ProofShape:
    config: CircuitConfig
    h: int
    num_pis: int
    num_selectors: int

    @property
    def n_lde(self) -> int:
        return self.h << self.config.rate_bits

    @property
    def cap_size(self) -> int:
        return 1 << self.config.cap_height

    @property
    def n_preproc(self) -> int:
        return (self.num_selectors + self.config.num_routed_wires +
                self.config.num_constants)

    @property
    def n_aux(self) -> int:
        cfg = self.config
        n_chunks = -(-cfg.num_routed_wires // cfg.perm_chunk_size)
        return cfg.num_challenges * (1 + n_chunks)

    @property
    def n_quot(self) -> int:
        return self.config.num_challenges << self.config.rate_bits

    @property
    def oracle_widths(self) -> tuple:
        return (self.n_preproc, self.config.num_wires, self.n_aux,
                self.n_quot)

    @property
    def num_columns(self) -> int:
        return sum(self.oracle_widths)

    @property
    def main_levels(self) -> int:
        return _log2(self.n_lde) - min(self.config.cap_height,
                                       _log2(self.n_lde))

    @property
    def fri_sizes(self) -> tuple:
        """Codeword length at each committed FRI layer (fri.commit_phase
        loop condition)."""
        cfg = self.config
        sizes = []
        n = self.n_lde
        while n > (cfg.fri_final_poly_len << cfg.rate_bits):
            sizes.append(n)
            n //= 4
        return tuple(sizes)

    @property
    def final_n(self) -> int:
        return self.fri_sizes[-1] // 4 if self.fri_sizes else self.n_lde

    @property
    def final_len(self) -> int:
        return self.final_n >> self.config.rate_bits

    def layer_levels(self, li: int) -> int:
        m = self.fri_sizes[li] // 4          # leaves of layer li's tree
        return _log2(m) - min(self.config.cap_height, _log2(m))

    def layer_cap_size(self, li: int) -> int:
        m = self.fri_sizes[li] // 4
        return 1 << min(self.config.cap_height, _log2(m))

    @property
    def num_queries(self) -> int:
        return self.config.fri_num_queries


@dataclass
class ProofTarget:
    """Targets for every element of a prover.Proof (the
    add_virtual_proof_with_pis equivalent)."""
    shape: ProofShape
    public_inputs: np.ndarray        # (num_pis,)
    wires_cap: np.ndarray            # (cap, 4)
    aux_cap: np.ndarray
    quotient_cap: np.ndarray
    open_z: np.ndarray               # (num_columns, 2)
    open_gz: np.ndarray
    fri_caps: list                   # per layer (cap_l, 4)
    fri_final: np.ndarray            # (final_len, 2)
    pow_witness: int
    main_leaves: list                # per oracle (Q, width_o)
    main_sibs: list                  # per oracle (Q, main_levels, 4)
    fri_leaves: list                 # per layer (Q, 4, 2)
    fri_sibs: list                   # per layer (Q, layer_levels, 4)

    @classmethod
    def allocate(cls, b, shape: ProofShape) -> "ProofTarget":
        Q = shape.num_queries
        cap = shape.cap_size

        def t(*dims):
            n = int(np.prod(dims))
            return b.add_virtual_targets(n).reshape(*dims)

        return cls(
            shape=shape,
            public_inputs=t(shape.num_pis),
            wires_cap=t(cap, 4),
            aux_cap=t(cap, 4),
            quotient_cap=t(cap, 4),
            open_z=t(shape.num_columns, 2),
            open_gz=t(shape.num_columns, 2),
            fri_caps=[t(shape.layer_cap_size(li), 4)
                      for li in range(len(shape.fri_sizes))],
            fri_final=t(shape.final_len, 2),
            pow_witness=b.add_virtual_target(),
            main_leaves=[t(Q, w) for w in shape.oracle_widths],
            main_sibs=[t(Q, shape.main_levels, 4) for _ in range(4)],
            fri_leaves=[t(Q, 4, 2) for _ in shape.fri_sizes],
            fri_sibs=[t(Q, shape.layer_levels(li), 4)
                      for li in range(len(shape.fri_sizes))],
        )

    def body_indices(self) -> np.ndarray:
        """Every proof target EXCEPT the public inputs — the values that
        only exist once the inner proof is actually proven. (The PIs are
        natively predictable via ivc/fastpath.step_pi_values, so the
        staged-witness split treats only the body as 'late'.)"""
        parts = ([self.wires_cap, self.aux_cap, self.quotient_cap,
                  self.open_z, self.open_gz, self.fri_final,
                  np.array([self.pow_witness])] + self.fri_caps +
                 self.main_leaves + self.main_sibs + self.fri_leaves +
                 self.fri_sibs)
        return np.concatenate([np.asarray(a, np.int64).ravel()
                               for a in parts if np.asarray(a).size])

    def assign(self, pw, proof) -> None:
        """set_proof_with_pis_target equivalent (ivc_based_vpbs.rs:292,
        345): copy a native Proof's values onto the targets."""
        sh = self.shape
        pw.set_target_arr(self.public_inputs, proof.public_inputs)
        pw.set_target_arr(self.wires_cap, proof.wires_cap)
        pw.set_target_arr(self.aux_cap, proof.aux_cap)
        pw.set_target_arr(self.quotient_cap, proof.quotient_cap)
        oz = np.concatenate([o.at_zeta for o in proof.openings])
        ogz = np.concatenate([o.at_gzeta for o in proof.openings])
        pw.set_target_arr(self.open_z, oz)
        pw.set_target_arr(self.open_gz, ogz)
        assert len(proof.fri_caps) == len(self.fri_caps)
        for t, c in zip(self.fri_caps, proof.fri_caps):
            pw.set_target_arr(t, c)
        pw.set_target_arr(self.fri_final, proof.fri_final_coeffs)
        pw.set_target(self.pow_witness, proof.pow_witness)
        Q = sh.num_queries
        assert len(proof.query_openings) == Q
        for o in range(4):
            leaves = np.stack([np.asarray(proof.query_openings[q].leaves[o],
                                          dtype=np.uint64)
                               for q in range(Q)])
            sibs = np.stack([np.stack(proof.query_openings[q].siblings[o])
                             for q in range(Q)])
            pw.set_target_arr(self.main_leaves[o], leaves)
            pw.set_target_arr(self.main_sibs[o], sibs)
        for li in range(len(sh.fri_sizes)):
            leaves = np.stack([np.asarray(
                proof.fri_query_rounds[q].layers[li].leaf, dtype=np.uint64)
                for q in range(Q)])
            sibs = [proof.fri_query_rounds[q].layers[li].siblings
                    for q in range(Q)]
            pw.set_target_arr(self.fri_leaves[li], leaves)
            if self.fri_sibs[li].size:
                pw.set_target_arr(self.fri_sibs[li],
                                  np.stack([np.stack(s) for s in sibs]))

    def assign_dummy(self, pw) -> None:
        """Base-case assignment: an all-zero proof (every recursive-
        verifier assertion is gated on ``condition`` so zeros satisfy the
        circuit — the cyclic_base_proof equivalent, ivc_based_vpbs.rs:294)."""
        for arr in ([self.public_inputs, self.wires_cap, self.aux_cap,
                     self.quotient_cap, self.open_z, self.open_gz,
                     self.fri_final] + self.fri_caps + self.main_leaves +
                    self.main_sibs + self.fri_leaves + self.fri_sibs):
            if np.asarray(arr).size:
                pw.set_target_arr(arr, np.zeros(np.asarray(arr).shape,
                                                np.uint64))
        pw.set_target(self.pow_witness, 0)
