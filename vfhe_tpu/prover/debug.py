"""Trace-level constraint checking (no proving): the debugging lens.

Evaluates every gate constraint on the witness trace over the raw row
domain H (where all filtered constraints must vanish exactly), plus the
copy constraints, and reports precise (gate, constraint, row) failures.
Orders of magnitude faster than proving + verifying when iterating on a
new circuit (the in-circuit recursive verifier especially), and the
errors it produces are actionable where a failed PLONK identity is not.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..hashing import poseidon as HP
from ..circuit.compile import CircuitData, PartialWitness
from .constraints import eval_gate_stacked

KIND_NAMES = {0: "NOOP", 1: "ARITH", 2: "BASESUM", 3: "POS1", 4: "CONST",
              5: "PI", 6: "SELECT", 7: "BASESUM_CANON", 8: "NTTBF",
              9: "NTTBF_INV", 10: "DECOMP", 11: "NTTBF4",
              12: "NTTBF4_INV", 13: "DOT", 14: "CSEL"}


def check_witness(data: CircuitData, pw: PartialWitness,
                  max_report: int = 20) -> list:
    """Returns a list of human-readable constraint violations (empty =
    the witness satisfies the circuit)."""
    w = data.eval_witness(pw)
    return check_witness_vector(data, w, max_report)


def check_witness_vector(data: CircuitData, w: np.ndarray,
                         max_report: int = 20) -> list:
    failures = []
    trace = np.asarray(w)[data.wire_index]               # (h, W)
    pis = np.asarray(w)[data.pi_targets] if len(data.pi_targets) else \
        np.zeros(0, np.uint64)
    pi_hash = np.asarray(HP.hash_no_pad_jit(jnp.asarray(pis))) \
        if pis.size else np.zeros(4, np.uint64)

    cols = jnp.asarray(trace.T)                          # (W, h)
    const_cols = jnp.asarray(data.row_consts.T)          # (nc, h)
    for gi, gate in enumerate(data.gates):
        cs = np.asarray(eval_gate_stacked(gate, cols, const_cols,
                                          jnp.asarray(pi_hash)))
        sel = data.selectors[gi].astype(bool)
        bad = np.argwhere(cs[:, sel] != 0)
        if bad.size:
            rows = np.flatnonzero(sel)
            for ci, ri in bad[:max_report]:
                failures.append(
                    f"gate {KIND_NAMES.get(gate.kind, gate.kind)}"
                    f"(p={gate.param}) constraint {ci} row {rows[ri]}: "
                    f"value {cs[ci, rows[ri]]}")
            if len(bad) > max_report:
                failures.append(f"... and {len(bad) - max_report} more in "
                                f"gate {KIND_NAMES.get(gate.kind)}")

    if data.copies:
        xy = np.asarray(data.copies, dtype=np.int64)
        wx = np.asarray(w)[xy[:, 0]]
        wy = np.asarray(w)[xy[:, 1]]
        bad = np.flatnonzero(wx != wy)
        for i in bad[:max_report]:
            failures.append(f"copy constraint {xy[i, 0]} == {xy[i, 1]}: "
                            f"{wx[i]} != {wy[i]}")
        if len(bad) > max_report:
            failures.append(f"... and {len(bad) - max_report} more copies")
    return failures
