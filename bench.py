"""Benchmark: hot-kernel throughput on the current device.

Prints ONE JSON line (the driver contract):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is the PROVER-LEVEL step latency
(vpbs_step_latency_s: paper shape, h=2^13, batch-8 fast path, warm) —
the trustworthy round-over-round trend line; kernel micro-rates are
dispatch-noise-dominated through the TPU tunnel (BENCH_EXTRA.md) and
are demoted to `extra:` lines. vs_baseline is the round-4 recorded
step latency (0.354 s) divided by this run's, so >1 means faster than
the round-4 record. If the step-latency probe fails, the headline
degrades to the NTT kernel rate with vs_baseline 1.0 (the reference
repo publishes no numbers, BASELINE.md).

Extra machine-readable metrics go to stderr as JSON lines prefixed
"extra: " — Poseidon permutations/s, the serially-DEPENDENT NTT chain
rate (what a single sequential caller sees), and a measured
speed-of-light proxy (standalone u64 mulmod rate; one butterfly is one
twiddle mulmod + add/sub, so the mulmod rate bounds butterflies/s).
Round-1's 2x bench/prose discrepancy (VERDICT.md "benchmark
bookkeeping") came from measuring ONLY the dependent chain; both are
now reported, throughput is the headline.
"""

import json
import sys
import time

import numpy as np


def _time(fn, iters):
    fn().block_until_ready()          # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return time.perf_counter() - t0


def _tunnel_alive(timeout_s: int = 90) -> bool:
    """Probe the TPU tunnel in a SUBPROCESS (external kill — a SIGALRM
    inside this process cannot interrupt a device op stuck in a C++
    futex wait). The tunnel stalls for tens of minutes at a time
    (CLAUDE.md round-5 notes); a bench that hangs forever records
    nothing, an honest skip line records the cause."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(int((jnp.arange(4, dtype=jnp.uint64) ** 2).sum()))"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "14" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    if not _tunnel_alive():
        print("TPU tunnel unresponsive (device ops hang; known "
              "multi-minute stalls, CLAUDE.md round-5 notes) — "
              "measured prover numbers live in BENCH_EXTRA.md",
              file=sys.stderr)
        print(json.dumps({
            "metric": "bench_skipped_tpu_tunnel_stall",
            "value": 1,
            "unit": "see BENCH_EXTRA.md for the measured step latency "
                    "(0.392 s/step explicit, 3.14 s/step/chain "
                    "recursive B=2, round 5)",
            "vs_baseline": 0.0,
        }))
        return 0
    import jax
    import jax.numpy as jnp
    from vfhe_tpu.field import goldilocks as gl   # enables x64
    from vfhe_tpu.ntt import ntt_forward
    from vfhe_tpu.hashing import poseidon as HP

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    def extra(metric, value, unit):
        print("extra: " + json.dumps(
            {"metric": metric, "value": value, "unit": unit}),
            file=sys.stderr)

    n = 1024
    batch = 1024
    iters = 50
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, gl.P, (batch, n), dtype=np.uint64))
    logn = n.bit_length() - 1
    bflies = batch * (n // 2) * logn * iters

    # throughput: independent dispatches (the batched-prover regime)
    dt = _time(lambda: ntt_forward(x), iters)
    rate = bflies / dt
    print(f"NTT N={n} batch={batch}: independent {dt/iters*1e6:.0f} us/call"
          f" -> {rate:.3e} butterflies/s", file=sys.stderr)

    # latency: serially dependent chain (single sequential caller)
    y = ntt_forward(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = ntt_forward(y)
    y.block_until_ready()
    dt_dep = time.perf_counter() - t0
    extra(f"ntt_dependent_chain_butterflies_per_s_N{n}", bflies / dt_dep,
          "butterflies/s/chip")

    # Poseidon permutations/s (bounds Merkle commit + witness sponges).
    # "standard" = the full-MDS rounds (witness-gen form); "fast" = the
    # optimized sparse partial rounds all Merkle/transcript/PoW hashing
    # uses (bit-identical, hashing/poseidon.permute_fast).
    pbatch = 1 << 15
    st = jnp.asarray(rng.integers(0, gl.P, (pbatch, 12), dtype=np.uint64))
    perm = jax.jit(HP.permute)
    dtp = _time(lambda: perm(st), iters)
    extra("poseidon_permutations_per_s_standard", pbatch * iters / dtp,
          "permutations/s/chip")
    dtpf = _time(lambda: HP.permute_fast_jit(st, False), iters)
    extra("poseidon_permutations_per_s", pbatch * iters / dtpf,
          "permutations/s/chip")

    # roofline context: a standalone u64 mulmod at this footprint is
    # HBM-BANDWIDTH-bound (24 B moved per mulmod), so a fused multi-stage
    # kernel like the NTT can exceed its element rate; the meaningful
    # speed-of-light for both is effective HBM bytes/s vs the chip's
    # peak. Report both the mulmod rate and each kernel's effective
    # bandwidth (16 B/element/pass for the in-place NTT).
    a = jnp.asarray(rng.integers(0, gl.P, (batch, n), dtype=np.uint64))
    mul = jax.jit(gl.mul)
    dtm = _time(lambda: mul(a, x), iters)
    extra("u64_mulmod_per_s_hbm_bound_reference",
          a.size * iters / dtm, "mulmods/s/chip")
    extra("ntt_effective_hbm_bandwidth", 16 * x.size * iters / dt, "B/s")
    extra("mulmod_effective_hbm_bandwidth", 24 * a.size * iters / dtm,
          "B/s")

    # Pallas: RETIRED in round 4. This environment's remote TPU compile
    # service rejects every Mosaic kernel (HTTP 500 "tpu_compile_helper
    # subprocess exit code 1" — observed rounds 2, 3 and 4), so the
    # 2x32-limb pallas mulmod never produced a hardware number in three
    # rounds; XLA's fusion already holds both NTT and Poseidon at the
    # VPU roofline (BENCH_EXTRA.md), leaving a hand kernel no headroom.
    # The kernel lives in git history (vfhe_tpu/field/pallas_gl.py,
    # removed round 4) for when the service learns Mosaic.

    # vPBS step-proof latency at PAPER shape (N=1024, K=2, ELL=4,
    # LOGB=5, n=728; h=2^13 step circuit, standard 28-query/16-bit-PoW
    # FRI config) — the prover-level metric the driver record lacked
    # (VERDICT round 3, weak #2). Proves a REAL mid-chain step (step 1:
    # rotation + external product against bsk[0]) three times warm.
    # Soft-fails: any error or a 1500 s budget overrun degrades to an
    # `extra: vpbs_step_latency_skipped` line, never kills the headline.
    try:
        import signal

        def _alarm(signum, frame):
            raise TimeoutError("step-latency budget exceeded")
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(1500)
        t_sec = time.perf_counter()
        from vfhe_tpu.crypto import (lwe as clwe, glwe as cglwe,
                                     ggsw as cggsw, compute_bsk, get_testv)
        from vfhe_tpu.circuit import STANDARD_CONFIG
        from vfhe_tpu.hashing import poseidon as HPm
        from vfhe_tpu.ivc import VpbsParams, get_step_circuit
        from vfhe_tpu.ivc.fastpath import native_step
        from vfhe_tpu.ivc.vpbs import make_step_witness
        from vfhe_tpu.prover.batch import prove_batch

        p = VpbsParams()                      # paper set (main.rs:22-30)
        k1, k2, k3, k4, k6 = jax.random.split(jax.random.PRNGKey(0), 5)
        s_to = cglwe.partial_key(k1, p.n, p.N, p.K)
        s_lwe = cglwe.flatten_partial_key(s_to, p.n)
        s_glwe = cglwe.key_gen(k2, p.N, p.K)
        bsk = compute_bsk(k3, s_lwe, s_glwe, 0.0, p.ELL, p.LOGB)
        ksk = cggsw.compute_ksk(k4, s_to, s_glwe, 0.0, p.ELL, p.LOGB)
        delta = clwe.get_delta(2 * p.p)
        testv = get_testv(p.p, delta, p.N)
        ct = clwe.encrypt(k6, s_lwe, gl.h_mul(delta, 1), 0.0)
        print(f"step-latency: key material {time.perf_counter()-t_sec:.1f}s",
              file=sys.stderr)
        sc = get_step_circuit(p, STANDARD_CONFIG)
        print(f"step-latency: circuit built (h={sc.data.h}) "
              f"{time.perf_counter()-t_sec:.1f}s", file=sys.stderr)
        # 2-step native-chain prefix (only step 1's inputs are needed)
        ct_np = np.asarray(ct, dtype=np.uint64)
        dummy = cggsw.dummy_ct(p.N, p.K, p.ELL)
        acc0 = jnp.asarray(np.concatenate(
            [np.zeros((p.K - 1) * p.N, np.uint64),
             np.asarray(testv)]).reshape(p.K, p.N))
        acc1 = native_step(acc0, dummy, int(ct_np[p.n]), 1, p)
        acc2 = native_step(acc1, bsk[0], int(ct_np[0]), 2, p)
        bsk_digs, lwe_digs = [], []
        hb = lw = [0, 0, 0, 0]
        for g, mask in ((dummy, int(ct_np[p.n])), (bsk[0], int(ct_np[0]))):
            hb = HPm.hash_no_pad_host(
                list(hb) + [int(x) for x in np.asarray(g).reshape(-1)])
            lw = HPm.hash_no_pad_host(list(lw) + [mask])
            bsk_digs.append(list(hb))
            lwe_digs.append(list(lw))
        natives = ([acc0, acc1, acc2], bsk_digs, lwe_digs)
        pw = make_step_witness(sc, 1, ct_np, testv, bsk, ksk,
                               natives=natives)
        # batch of 8 (the fast path's production shape — what the full
        # 730-step run compiles and runs); s/step = batch time / 8
        pws = [pw] * 8
        proofs = prove_batch(sc.data, pws)    # compile + warmup
        print(f"step-latency: first batch (compile) "
              f"{time.perf_counter()-t_sec:.1f}s", file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            proofs = prove_batch(sc.data, pws)
            times.append(time.perf_counter() - t0)
        signal.alarm(0)
        lat = sorted(times)[1] / 8
        extra("vpbs_projected_full_chain_s", lat * p.num_steps,
              "s (730 steps, single-chip fast-path projection; measured "
              "full run: BENCH_EXTRA.md)")
        print(f"step-latency: batch8 {times} -> {lat:.2f} s/step",
              file=sys.stderr)
    except Exception as e:                                  # noqa: BLE001
        signal.alarm(0)
        lat = None
        reason = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"step-latency skipped: {reason}", file=sys.stderr)
        extra("vpbs_step_latency_skipped", 1, reason)

    if lat is not None:
        extra(f"goldilocks_negacyclic_ntt_butterflies_per_s_N{n}", rate,
              "butterflies/s/chip")
        print(json.dumps({
            "metric": "vpbs_step_latency_s",
            "value": lat,
            "unit": "s/step (paper shape, h=2^13, standard config, "
                    "batch-8 fast path, warm, one v5e chip)",
            "vs_baseline": 0.354 / lat,   # round-4 record / this run
        }))
    else:
        print(json.dumps({
            "metric": f"goldilocks_negacyclic_ntt_butterflies_per_s_N{n}",
            "value": rate,
            "unit": "butterflies/s/chip",
            "vs_baseline": 1.0,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
