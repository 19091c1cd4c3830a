"""Row census: where do the step / recursive-step circuit rows go?

Builds the circuits (CPU backend — heavy compiles are skipped by only
running the ledger/compile path, not proving) and prints rows per gate
kind, Poseidon permutation counts, and wire occupancy — the data behind
the h=2^15 row-packing work (CLAUDE.md round-3 queue item 3b).

Usage: python scripts/row_census.py [--toy] [--recursive]
"""

import argparse
import collections
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(message)s")


def census(data, cfg):
    from vfhe_tpu.prover.debug import KIND_NAMES as names
    counts = collections.Counter()
    sel_rows = data.selectors.sum(axis=1)
    for g in data.gates:
        key = (names[g.kind], g.param)
        counts[key] += int(sel_rows[g.selector])
    total = sum(counts.values())
    print(f"  rows_used={data.rows_used} h={data.h} "
          f"(occupancy {data.rows_used / data.h:.1%}) "
          f"targets={data.num_targets}")
    pos_rows = 0
    for (name, param), n in sorted(counts.items(),
                                   key=lambda kv: -kv[1]):
        extra = f" width={param}" if param else ""
        print(f"    {name:14s}{extra:10s} {n:7d} rows "
              f"({n / total:5.1%})")
        if name.startswith("POS"):
            pos_rows += n
    print(f"    => poseidon total: {pos_rows} rows "
          f"({pos_rows / total:.1%}), {pos_rows} permutations")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--recursive", action="store_true")
    ap.add_argument("--skip-plain", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from vfhe_tpu.circuit import STANDARD_CONFIG
    from vfhe_tpu.ivc.vpbs import (VpbsParams, TEST_PARAMS,
                                   get_step_circuit,
                                   get_recursive_step_circuit)

    p = TEST_PARAMS if args.toy else VpbsParams()
    cfg = STANDARD_CONFIG

    if not args.skip_plain:
        t0 = time.perf_counter()
        sc = get_step_circuit(p, cfg)
        print(f"step circuit ({time.perf_counter() - t0:.1f}s):")
        census(sc.data, cfg)

    if args.recursive:
        t0 = time.perf_counter()
        rsc = get_recursive_step_circuit(p, cfg)
        print(f"recursive step circuit ({time.perf_counter() - t0:.1f}s):")
        census(rsc.data, cfg)


if __name__ == "__main__":
    main()
