"""Summarize a recursive-batch run: s/step from the prove-step
TimingTree lines and from checkpoint mtimes, with stall detection.

Usage: python scripts/rb_stats.py <run.log> <checkpoint_dir> [B]

Separates TRUE prover pace from tunnel-outage wall-clock: any
inter-checkpoint gap > 60 s is counted as stall time and reported
separately (the v5e tunnel stalls for tens of minutes and recovers —
CLAUDE.md round-5 notes; the prover is idle in futex_wait throughout,
so those minutes say nothing about prover speed).
"""

import os
import re
import statistics
import sys


def main() -> int:
    log_path, ckpt = sys.argv[1], sys.argv[2]
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    # 1. TimingTree step totals (exclude the compile-carrying step 0)
    times = []
    for ln in open(log_path):
        m = re.search(r"([\d.]+)s  prove rec step (\d+) \(batch (\d+)\)",
                      ln)
        if m:
            times.append((int(m.group(2)), float(m.group(1))))
    if times:
        v = [t for s, t in times if s > 0]
        v_sorted = sorted(v)
        print(f"prove-step scope ({len(v)} steps, batch {B}): "
              f"median {statistics.median(v):.2f}s  "
              f"mean {statistics.mean(v):.2f}s  "
              f"p90 {v_sorted[int(0.9 * len(v))]:.2f}s  "
              f"min {v_sorted[0]:.2f}s max {v_sorted[-1]:.2f}s")
        med = statistics.median(v)
        print(f"  -> {med / B:.2f} s/step/chain "
              f"({B} chains in lock-step)")

    # 2. checkpoint mtime deltas (wall clock incl. host + stalls)
    mts = []
    step = 0
    while True:
        p = os.path.join(ckpt, f"rstep_{step}_b{B - 1}.bin")
        if not os.path.exists(p):
            break
        mts.append(os.path.getmtime(p))
        step += 1
    if len(mts) > 2:
        deltas = [b - a for a, b in zip(mts, mts[1:])]
        clean = [d for d in deltas if d <= 60]
        stalls = [d for d in deltas if d > 60]
        d_sorted = sorted(clean)
        print(f"checkpoint deltas ({len(deltas)} steps): "
              f"median {statistics.median(clean):.2f}s  "
              f"mean(clean) {statistics.mean(clean):.2f}s  "
              f"p90 {d_sorted[int(0.9 * len(clean))]:.2f}s")
        print(f"  -> {statistics.median(clean) / B:.2f} s/step/chain; "
              f"{len(stalls)} tunnel stalls totaling "
              f"{sum(stalls):.0f}s excluded "
              f"(wall {mts[-1] - mts[0]:.0f}s for {len(deltas)} steps)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
