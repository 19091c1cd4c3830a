"""E2E driver: params -> keygen -> bsk/ksk -> encrypt -> prove PBS ->
verify -> decrypt (ref: src/main.rs:19-67).

Default is a fast demo configuration; pass --paper for the paper's
parameter set (LOGB=5, ELL=4, K=2, n=728, N=1024, p=2; main.rs:22-30).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--paper", action="store_true",
                    help="paper parameter set (n=728, N=1024) — heavy")
    ap.add_argument("--n", type=int, default=None, help="LWE dimension")
    ap.add_argument("--N", type=int, default=None, help="ring dimension")
    ap.add_argument("--ell", type=int, default=None)
    ap.add_argument("--logb", type=int, default=None)
    ap.add_argument("--sigma-glwe", type=float, default=4.99027217501041e-8)
    ap.add_argument("--sigma-lwe", type=float, default=1.17021618159313e-5)
    ap.add_argument("--noiseless", action="store_true",
                    help="sigma = 0 (deterministic)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--test-config", action="store_true",
                    help="reduced FRI queries (faster, lower soundness)")
    ap.add_argument("--recursive", action="store_true",
                    help="cyclic IVC: each step verifies the previous "
                         "proof in-circuit; ONE O(1) proof per PBS "
                         "(ivc_based_vpbs.rs:159-386)")
    ap.add_argument("--batch", type=int, default=1,
                    help="prove B independent ciphertexts in lock-step "
                         "(batched prover; works with and without "
                         "--recursive)")
    ap.add_argument("--fast", action="store_true",
                    help="explicit-chain fast path: compute the chain "
                         "natively, then prove ALL steps in lock-step "
                         "batches (ivc/fastpath.verified_pbs_fast)")
    ap.add_argument("--step-batch", type=int, default=8,
                    help="steps per prove_batch call in --fast mode")
    ap.add_argument("--stage2-device", action="store_true",
                    help="run the recursive stage-2 witness as chunked "
                         "device jits instead of on the host CPU")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="persist/resume per-step proofs here")
    ap.add_argument("--no-noise-log", action="store_true",
                    help="skip per-step noise telemetry (the decrypt-"
                         "and-log debug pass adds host work to every "
                         "recursive step; production timing runs want "
                         "it off)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(levelname)s %(name)s: %(message)s")

    import jax
    import jax.numpy as jnp
    from vfhe_tpu.field import goldilocks as gl
    from vfhe_tpu.crypto import (poly as cpoly, lwe as clwe, glwe as cglwe,
                                 ggsw as cggsw, compute_bsk, get_testv)
    from vfhe_tpu.circuit import STANDARD_CONFIG, TEST_CONFIG
    from vfhe_tpu.ivc import (VpbsParams, verified_pbs, verify_pbs,
                              verified_pbs_recursive, verify_pbs_recursive)

    if args.paper:
        params = VpbsParams()                       # main.rs:22-30
    else:
        params = VpbsParams(n=2, N=8, K=2, ELL=8, LOGB=8, p=2)
    if args.n is not None:
        params = VpbsParams(n=args.n, N=args.N or params.N, K=params.K,
                            ELL=args.ell or params.ELL,
                            LOGB=args.logb or params.LOGB, p=params.p)
    config = TEST_CONFIG if args.test_config else STANDARD_CONFIG
    sigma_glwe = 0.0 if args.noiseless else args.sigma_glwe
    sigma_lwe = 0.0 if args.noiseless else args.sigma_lwe

    log = logging.getLogger("vfhe_tpu.main")
    log.info("parameters: n=%d N=%d k=%d logB=%d ell=%d p=%d",
             params.n, params.N, params.K - 1, params.LOGB, params.ELL,
             params.p)

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    # partial GLWE key whose prefix is the LWE key (main.rs:40-42)
    s_to = cglwe.partial_key(k1, params.n, params.N, params.K)
    s_lwe = cglwe.flatten_partial_key(s_to, params.n)
    s_glwe = cglwe.key_gen(k2, params.N, params.K)

    t0 = time.time()
    bsk = compute_bsk(k3, s_lwe, s_glwe, sigma_glwe, params.ELL, params.LOGB)
    ksk = cggsw.compute_ksk(k4, s_to, s_glwe, sigma_lwe, params.ELL,
                            params.LOGB)
    log.info("key material in %.2fs", time.time() - t0)

    delta = clwe.get_delta(2 * params.p)
    testv = get_testv(params.p, delta, params.N)
    m = int(jax.random.randint(k5, (), 0, params.p))
    ct = clwe.encrypt(k6, s_lwe, gl.h_mul(delta, m), sigma_lwe)

    if args.batch > 1:
        from vfhe_tpu.ivc import (verified_pbs_batch,
                                  verified_pbs_recursive_batch)
        B = args.batch
        ms = [int(x) for x in
              jax.random.randint(k5, (B,), 0, params.p)]
        cts = np.stack([np.asarray(clwe.encrypt(k, s_lwe,
                                                gl.h_mul(delta, mi),
                                                sigma_lwe))
                        for k, mi in zip(jax.random.split(k6, B), ms)])
        t0 = time.time()
        if args.recursive:
            out_cts, proofs, sc = verified_pbs_recursive_batch(
                cts, testv, bsk, ksk, params, config=config,
                stage2_device=args.stage2_device,
                checkpoint_dir=args.checkpoint_dir)
            log.info("proved %d chains x %d steps (one O(1) proof each) "
                     "in %.2fs", B, params.num_steps, time.time() - t0)
            t0 = time.time()
            for b in range(B):
                verify_pbs_recursive(out_cts[b], cts[b], testv, bsk, ksk,
                                     proofs[b], sc)
        else:
            out_cts, chains, sc = verified_pbs_batch(
                cts, testv, bsk, ksk, params, config=config)
            log.info("proved %d chains x %d steps in %.2fs", B,
                     params.num_steps, time.time() - t0)
            t0 = time.time()
            for b in range(B):
                verify_pbs(out_cts[b], cts[b], testv, bsk, ksk,
                           chains[b], sc)
        log.info("verified in %.2fs", time.time() - t0)
        outs = []
        for b in range(B):
            m_bar = np.asarray(cglwe.decrypt(out_cts[b], s_to))
            outs.append(round(int(m_bar[0]) / delta) % (2 * params.p))
        log.info("in: %s out: %s", ms, outs)
        print(f"PBS batch messages in={ms} out={outs}")
        return 0

    t0 = time.time()
    if args.fast and not args.recursive:
        from vfhe_tpu.ivc.fastpath import verified_pbs_fast
        out_ct, proofs, sc = verified_pbs_fast(
            ct, testv, bsk, ksk, params, config=config,
            batch_size=args.step_batch,
            checkpoint_dir=args.checkpoint_dir)
        log.info("proved %d steps (fast path, batch %d) in %.2fs",
                 len(proofs), args.step_batch, time.time() - t0)
        t0 = time.time()
        verify_pbs(out_ct, ct, testv, bsk, ksk, proofs, sc)
    elif args.recursive:
        dbg = dict(debug_glwe_key=s_glwe, debug_lwe_key=s_lwe,
                   debug_ksk_key=s_to) if not args.no_noise_log else {}
        out_ct, final_proof, sc = verified_pbs_recursive(
            ct, testv, bsk, ksk, params, config=config,
            checkpoint_dir=args.checkpoint_dir,
            stage2_device=args.stage2_device, **dbg)
        log.info("proved %d steps (one O(1) proof) in %.2fs",
                 params.num_steps, time.time() - t0)
        t0 = time.time()
        verify_pbs_recursive(out_ct, ct, testv, bsk, ksk, final_proof, sc)
    else:
        out_ct, proofs, sc = verified_pbs(
            ct, testv, bsk, ksk, params, config=config,
            debug_glwe_key=s_glwe, debug_lwe_key=s_lwe, debug_ksk_key=s_to,
            checkpoint_dir=args.checkpoint_dir)
        log.info("proved %d steps in %.2fs", len(proofs), time.time() - t0)
        t0 = time.time()
        verify_pbs(out_ct, ct, testv, bsk, ksk, proofs, sc)
    log.info("verified in %.2fs", time.time() - t0)

    m_bar = np.asarray(cglwe.decrypt(out_ct, s_to))
    m_out = round(int(m_bar[0]) / delta) % (2 * params.p)
    log.info("in: %d out: %d", m, m_out)
    print(f"PBS message in={m} out={m_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
