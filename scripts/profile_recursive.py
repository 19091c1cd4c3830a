"""Profile paper-shape RECURSIVE proving steps on the TPU.

Builds the self-verifying step circuit (h=2^15 at paper params),
proves the first few IVC steps, and prints the TimingTree per step —
the recursive-mode latency measurement (CLAUDE.md round-3 queue 3).

Usage: python scripts/profile_recursive.py [--steps N] [--toy]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--toy", action="store_true")
    args = ap.parse_args()

    import jax
    from vfhe_tpu.field import goldilocks as gl
    from vfhe_tpu.circuit import PartialWitness, STANDARD_CONFIG
    from vfhe_tpu.crypto import (compute_bsk, get_testv, lwe as clwe,
                                 glwe as cglwe, ggsw as cggsw)
    from vfhe_tpu.ivc.vpbs import (VpbsParams, TEST_PARAMS,
                                   get_recursive_step_circuit)
    from vfhe_tpu.prover import prove, preprocess
    from vfhe_tpu.utils.timing import TimingTree

    p = TEST_PARAMS if args.toy else VpbsParams()
    cfg = STANDARD_CONFIG

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    s_to = cglwe.partial_key(k1, p.n, p.N, p.K)
    s_lwe = cglwe.flatten_partial_key(s_to, p.n)
    s_glwe = cglwe.key_gen(k2, p.N, p.K)
    bsk = compute_bsk(k3, s_lwe, s_glwe, 0.0, p.ELL, p.LOGB)
    ksk = cggsw.compute_ksk(k4, s_to, s_glwe, 0.0, p.ELL, p.LOGB)
    delta = clwe.get_delta(2 * p.p)
    testv = get_testv(p.p, delta, p.N)
    ct = np.asarray(clwe.encrypt(k5, s_lwe, gl.h_mul(delta, 1), 0.0),
                    dtype=np.uint64)
    print(f"keygen: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    sc = get_recursive_step_circuit(p, cfg)
    print(f"build recursive circuit: {time.perf_counter() - t0:.2f}s "
          f"(rows={sc.data.rows_used} h={sc.data.h} "
          f"targets={sc.data.num_targets})")
    t0 = time.perf_counter()
    vk = preprocess(sc.data)["vk"]
    print(f"preprocess: {time.perf_counter() - t0:.2f}s")

    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    bsk_np = np.asarray(bsk)

    prev = None
    for step in range(args.steps):
        t0 = time.perf_counter()
        pw = PartialWitness()
        sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
        if step == 0:
            g, mask = dummy, int(ct[p.n])
        else:
            g, mask = bsk_np[step - 1], int(ct[step - 1])
        sc.t_ggsw.assign(pw, g)
        pw.set_target(sc.t_mask, mask)
        pw.set_bool_target(sc.t_condition, step > 0)
        if step == 0:
            sc.t_proof.assign_dummy(pw)
        else:
            sc.t_proof.assign(pw, prev)
        pw.set_target_arr(sc.t_vk_cap, vk.preproc_cap)
        pw.set_target_arr(sc.t_vk_digest, vk.circuit_digest)
        prep = time.perf_counter() - t0

        tt = TimingTree(f"recursive step {step}")
        prev = prove(sc.data, pw, timing=tt)
        tt.done()
        print(f"step {step}: witness-prep {prep:.2f}s, "
              f"total {tt.elapsed:.2f}s")


if __name__ == "__main__":
    main()
