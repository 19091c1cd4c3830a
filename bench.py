"""Benchmark: Goldilocks negacyclic NTT throughput on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md), so vs_baseline is
reported as 1.0; butterflies/s/chip is the north-star kernel metric from
BASELINE.json. Extra context goes to stderr.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from vfhe_tpu.field import goldilocks as gl   # enables x64
    from vfhe_tpu.ntt import ntt_forward

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    n = 1024
    batch = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, gl.P, (batch, n), dtype=np.uint64))

    # compile + warmup
    ntt_forward(x).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = ntt_forward(y)
    y.block_until_ready()
    dt = time.perf_counter() - t0

    logn = n.bit_length() - 1
    butterflies = batch * (n // 2) * logn * iters
    rate = butterflies / dt
    print(f"N={n} batch={batch} iters={iters}: {dt*1e3:.1f} ms total, "
          f"{dt/iters*1e6:.0f} us/batch, {rate:.3e} butterflies/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"goldilocks_negacyclic_ntt_butterflies_per_s_N{n}",
        "value": rate,
        "unit": "butterflies/s/chip",
        "vs_baseline": 1.0,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
