"""Profile prove_batch at paper shape: the first in-process call
isolates compile/cache-load, the next two measure steady state.

Usage: python tools/profile_batch.py [B] [--no-seq]

--no-seq skips the sequential-prove comparison (a separate compile
family) — used to warm/profile exactly the batch family bench.py and
the production fast path run.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import logging
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(pos[0]) if pos else 4
    no_seq = "--no-seq" in sys.argv
    import jax
    import jax.numpy as jnp
    from vfhe_tpu.circuit import STANDARD_CONFIG, PartialWitness
    from vfhe_tpu.crypto import (glwe as cglwe, lwe as clwe, ggsw as cggsw,
                                 compute_bsk, get_testv)
    from vfhe_tpu.field import goldilocks as gl
    from vfhe_tpu.ivc import VpbsParams
    from vfhe_tpu.ivc.vpbs import get_step_circuit
    from vfhe_tpu.ivc.fastpath import (compute_chain, step_pi_values)
    from vfhe_tpu.prover.batch import prove_batch
    from vfhe_tpu.utils.timing import TimingTree

    p = VpbsParams(n=2, N=1024, K=2, ELL=4, LOGB=5, p=2)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    s_to = cglwe.partial_key(k1, p.n, p.N, p.K)
    s_lwe = cglwe.flatten_partial_key(s_to, p.n)
    s_glwe = cglwe.key_gen(k2, p.N, p.K)
    bsk = compute_bsk(k3, s_lwe, s_glwe, 0.0, p.ELL, p.LOGB)
    ksk = cggsw.compute_ksk(k4, s_to, s_glwe, 0.0, p.ELL, p.LOGB)
    delta = clwe.get_delta(2 * p.p)
    testv = get_testv(p.p, delta, p.N)
    ct = clwe.encrypt(k5, s_lwe, gl.h_mul(delta, 0), 0.0)

    sc = get_step_circuit(p, STANDARD_CONFIG)
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    t0 = time.time()
    accs, bsk_digs, lwe_digs = compute_chain(ct, testv, bsk, ksk, p)
    print(f"native chain: {time.time()-t0:.2f}s", flush=True)

    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))
    bsk_np, ksk_np = np.asarray(bsk), np.asarray(ksk)

    def make_pw(step):
        pw = PartialWitness()
        sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
        pw.set_target(sc.t_counter, step + 1)
        if step == 0:
            g, mask = dummy, int(np.asarray(ct)[p.n])
            hin = ([0] * 4, [0] * 4)
        elif step <= p.n:
            g, mask = bsk_np[step - 1], int(np.asarray(ct)[step - 1])
            hin = (bsk_digs[step - 1], lwe_digs[step - 1])
        else:
            g, mask = ksk_np, 0
            hin = (bsk_digs[step - 1], lwe_digs[step - 1])
        sc.t_ggsw.assign(pw, g)
        pw.set_target(sc.t_mask, mask)
        sc.t_acc_in.assign(pw, np.asarray(accs[step]))
        pw.set_target_arr(sc.t_bsk_hash_in, np.array(hin[0], np.uint64))
        pw.set_target_arr(sc.t_lwe_hash_in, np.array(hin[1], np.uint64))
        pw.set_target_arr(sc.data.pi_targets, step_pi_values(
            step, p, sc.layout, acc_init_vals, accs, bsk_digs, lwe_digs))
        pw.precompute_sponges(sc.data)
        return pw

    t0 = time.time()
    pws = [make_pw(min(s, p.num_steps - 1)) for s in range(B)]
    print(f"make_pws({B}): {time.time()-t0:.2f}s", flush=True)

    if not no_seq:
        from vfhe_tpu.prover import prove
        for run in (1, 2):
            tt = TimingTree(f"prove run {run} (sequential)")
            t0 = time.time()
            prove(sc.data, pws[0], timing=tt)
            dt = time.time() - t0
            tt.done()
            print(f"sequential prove run {run}: {dt:.2f}s", flush=True)

    for run in (1, 2, 3):
        tt = TimingTree(f"prove_batch run {run} (B={B})")
        t0 = time.time()
        proofs = prove_batch(sc.data, pws, timing=tt)
        dt = time.time() - t0
        tt.done()
        print(f"run {run}: {dt:.2f}s total -> {dt/B:.2f}s/proof",
              flush=True)

    # sanity: verify one proof
    from vfhe_tpu.prover import preprocess, verify
    vk = preprocess(sc.data)["vk"]
    t0 = time.time()
    verify(vk, proofs[0])
    print(f"verify 1 proof: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
