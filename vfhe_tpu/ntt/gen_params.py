"""Offline NTT parameter-file generator (CLI).

Parity tool for the reference's Sage script (src/ntt/gen_param_file.sage,
run as ``sage gen_param_file.sage N``): emits the same tables from the
same derivation (psi = 7^((q-1)/2N), bit-reversed ROOTS/INVROOTS, NINV)
plus a deterministic test vector computed with our NTT. Supports rust or
python output for cross-checking against the reference's committed
files.

Usage: python -m vfhe_tpu.ntt.gen_params N [--format rust|python]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..field import goldilocks as gl
from .params import get_params


def render(n: int, fmt: str = "python", seed: int = 0) -> str:
    p = get_params(n)
    rng = np.random.default_rng(seed)
    testg = rng.integers(0, gl.P, n, dtype=np.uint64)

    import jax.numpy as jnp
    from .ntt import ntt_forward
    testghat = np.asarray(ntt_forward(jnp.asarray(testg)))

    if fmt == "rust":
        lines = [
            f"pub const N: usize = {n};",
            f"pub const LOGN: u32 = {p.logn};",
            f"pub const NINV: u64 = {p.ninv};",
            "",
            f"pub const ROOTS: [u64; {n}] = {p.roots.tolist()};",
            "",
            f"pub const INVROOTS: [u64; {n}] = {p.invroots.tolist()};",
            "",
            "// Test Vectors",
            "",
            f"pub const TESTG: [u64; {n}] = {testg.tolist()};",
            "",
            f"pub const TESTGHAT: [u64; {n}] = {testghat.tolist()};",
        ]
    else:
        lines = [
            f"N = {n}",
            f"LOGN = {p.logn}",
            f"NINV = {p.ninv}",
            f"ROOTS = {p.roots.tolist()}",
            f"INVROOTS = {p.invroots.tolist()}",
            f"TESTG = {testg.tolist()}",
            f"TESTGHAT = {testghat.tolist()}",
        ]
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("N", type=int)
    ap.add_argument("--format", choices=["rust", "python"], default="python")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    text = render(args.N, args.format)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        print(text, end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
