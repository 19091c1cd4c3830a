"""Profile one paper-shape batched proving step on the TPU, separating
host-side work (witness prep, initial-vector build/ship, transcript,
proof assembly) from device phases — the round-3 'unaccounted per-step
gap' target (CLAUDE.md).

Usage: python scripts/profile_step.py [--batch B] [--steps S] [--toy]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--recursive", action="store_true")
    args = ap.parse_args()

    import jax
    from vfhe_tpu.field import goldilocks as gl
    from vfhe_tpu.circuit import PartialWitness, STANDARD_CONFIG
    from vfhe_tpu.crypto import (compute_bsk, get_testv, lwe as clwe,
                                 glwe as cglwe, ggsw as cggsw)
    from vfhe_tpu.ivc.vpbs import VpbsParams, TEST_PARAMS, get_step_circuit
    from vfhe_tpu.ivc import fastpath as fp
    from vfhe_tpu.prover.batch import prove_batch
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
    ct = clwe.encrypt(k5, s_lwe, gl.h_mul(delta, 1), 0.0)
    print(f"keygen: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    sc = get_step_circuit(p, cfg)
    print(f"build circuit: {time.perf_counter() - t0:.2f}s "
          f"(h={sc.data.h}, targets={sc.data.num_targets})")

    t0 = time.perf_counter()
    accs, bsk_digs, lwe_digs = fp.compute_chain(ct, testv, bsk, ksk, p)
    print(f"native chain (all {p.num_steps} steps): "
          f"{time.perf_counter() - t0:.2f}s")

    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    bsk_np = np.asarray(bsk)
    ksk_np = np.asarray(ksk)
    from vfhe_tpu.crypto import ggsw as cggsw
    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))
    ctn = np.asarray(ct, dtype=np.uint64)

    def make_pw(step, tt):
        with tt.scope(f"make_pw {step}"):
            pw = PartialWitness()
            with tt.scope("assign"):
                sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
                pw.set_target(sc.t_counter, step + 1)
                if step == 0:
                    g, mask = dummy, int(ctn[p.n])
                    hin = ([0] * 4, [0] * 4)
                elif step <= p.n:
                    g, mask = bsk_np[step - 1], int(ctn[step - 1])
                    hin = (bsk_digs[step - 1], lwe_digs[step - 1])
                else:
                    g, mask = ksk_np, 0
                    hin = (bsk_digs[step - 1], lwe_digs[step - 1])
                sc.t_ggsw.assign(pw, g)
                pw.set_target(sc.t_mask, mask)
                sc.t_acc_in.assign(pw, np.asarray(accs[step]))
                pw.set_target_arr(sc.t_bsk_hash_in,
                                  np.array(hin[0], np.uint64))
                pw.set_target_arr(sc.t_lwe_hash_in,
                                  np.array(hin[1], np.uint64))
                pw.set_target_arr(sc.data.pi_targets, fp.step_pi_values(
                    step, p, sc.layout, acc_init_vals, accs, bsk_digs,
                    lwe_digs))
            with tt.scope("precompute_sponges"):
                pw.precompute_sponges(sc.data)
        return pw

    B = args.batch
    # warmup round (compiles)
    tt = TimingTree("warmup", print_on_done=False)
    pws = [make_pw(i, tt) for i in range(B)]
    t0 = time.perf_counter()
    proofs = prove_batch(sc.data, pws, timing=tt)
    tt.done()
    print(f"warmup batch: {time.perf_counter() - t0:.2f}s")

    for it in range(args.steps):
        tt = TimingTree(f"iter {it} (batch {B})")
        with tt.scope("host witness prep (make_pw x B)"):
            pws = [make_pw(i, tt) for i in range(B)]
        with tt.scope("prove_batch"):
            proofs = prove_batch(sc.data, pws, timing=tt)
        tt.done()

    # fine-grained: where does make_pw time go?
    tt = TimingTree("pw breakdown")
    pw = make_pw(1, tt)
    with tt.scope("initial_vector"):
        w0 = pw.initial_vector(sc.data)
    with tt.scope("ship to device"):
        import jax.numpy as jnp
        wd = jnp.asarray(np.stack([w0] * B))
        wd.block_until_ready()
    tt.done()
    print(f"initial vector: {w0.nbytes/1e6:.1f} MB x {B}")


if __name__ == "__main__":
    main()
