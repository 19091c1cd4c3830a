"""Native chain-state computation + fully batched PBS proving.

The reference's proving loop is sequential BY CONSTRUCTION because step
t verifies step t-1's proof in-circuit (SURVEY.md section 2). In the
round-1 chain mode, step t only consumes step t-1's public VALUES
(accumulator + hash-chain digests) — and those are exactly the native
blind-rotation intermediates, computable in milliseconds by the crypto
layer (which is bit-exact with the circuit; tested). So:

  1. run the whole PBS natively, recording every step's inputs;
  2. prove ALL n+2 steps in lock-step batches with prove_batch.

That converts the 730-step latency chain into a throughput problem —
the TPU-native win the reference cannot express. (When in-circuit
recursion lands, this fast path still computes witnesses; only the
proof-dependency becomes sequential again — mitigated by cross-
ciphertext batching.)
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..crypto import poly as cpoly, lwe as clwe, ggsw as cggsw
from ..circuit import CircuitConfig, PartialWitness, STANDARD_CONFIG
from ..hashing import poseidon as HP
from ..prover.batch import prove_batch
from ..utils.timing import TimingTree
from .vpbs import VpbsParams, get_step_circuit, _pis

log = logging.getLogger("vfhe_tpu")


def native_step(acc_in: jnp.ndarray, ggsw_hat: jnp.ndarray, mask: int,
                counter: int, params: VpbsParams) -> jnp.ndarray:
    """One step of the universal circuit, natively (bit-exact with
    build_step_circuit's witness; ref: ivc_based_vpbs.rs:103-124)."""
    p = params
    first = counter == 1
    last = counter == p.n + 2
    m = gl.h_neg(mask) if first else mask
    shift = int(clwe.mod_switch_element(jnp.uint64(m), p.N))
    rot = cpoly.rotate_monomial(acc_in, shift)
    if first:
        return rot
    diff = gl.sub(rot, acc_in)
    xin = acc_in if last else diff
    xout = cggsw.external_product(ggsw_hat, xin, p.LOGB)
    return xout if last else gl.add(xout, acc_in)


def compute_bsk_digests(bsk, ksk, params: VpbsParams) -> list:
    """The per-step bsk hash-chain digests — a pure function of the KEY
    MATERIAL (same for every ciphertext proved under it), so callers
    compute it once and share it across chains
    (ref: ivc_based_vpbs.rs:64-78)."""
    p = params
    dummy = cggsw.dummy_ct(p.N, p.K, p.ELL)
    digs = []
    h = [0, 0, 0, 0]
    for step in range(p.num_steps):
        g = dummy if step == 0 else (bsk[step - 1] if step <= p.n else ksk)
        h = HP.hash_no_pad_host(
            h + [int(x) for x in np.asarray(g).reshape(-1)])
        digs.append(list(h))
    return digs


def compute_chain(ct, testv, bsk, ksk, params: VpbsParams, bsk_digs=None):
    """All per-step inputs for a PBS chain, natively.

    Returns (accs: list of n+3 accumulator states (K, N) — index t is the
    input of step t; bsk_digests, lwe_digests: per-step hash-chain
    outputs). ``bsk_digs``: reuse a compute_bsk_digests result (the bsk
    chain is ciphertext-independent)."""
    p = params
    ct = np.asarray(ct, dtype=np.uint64)
    acc = jnp.asarray(np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
        .reshape(p.K, p.N))
    dummy = cggsw.dummy_ct(p.N, p.K, p.ELL)
    if bsk_digs is None:
        bsk_digs = compute_bsk_digests(bsk, ksk, p)

    accs = [acc]
    lwe_digs = []
    lwe_h = [0, 0, 0, 0]
    for step in range(p.num_steps):
        if step == 0:
            g, mask = dummy, int(ct[p.n])
        elif step <= p.n:
            g, mask = bsk[step - 1], int(ct[step - 1])
        else:
            g, mask = ksk, 0
        acc = native_step(acc, g, mask, step + 1, p)
        accs.append(acc)
        lwe_h = HP.hash_no_pad_host(lwe_h + [mask])
        lwe_digs.append(list(lwe_h))
    return accs, bsk_digs, lwe_digs


def step_pi_values(step: int, p: VpbsParams, lay, acc_init_vals,
                   accs, bsk_digs, lwe_digs, vk_pis=None) -> np.ndarray:
    """The step proof's full public-input vector from the native chain
    values — lets PartialWitness.precompute_sponges resolve the PI-hash
    sponge (the PI layout mirrors ivc_based_vpbs.rs:196-207). In
    recursive mode the layout carries a trailing verifier-data section;
    pass its values as ``vk_pis`` (cap ‖ circuit digest)."""
    pis = np.zeros(lay.num_pis, np.uint64)

    def put(rng, vals):
        pis[rng[0]:rng[1]] = np.asarray(vals, dtype=np.uint64).reshape(-1)

    put(lay.acc_init, acc_init_vals)
    pis[lay.counter] = step + 1
    put(lay.latest_acc, np.asarray(accs[step + 1]))
    put(lay.bsk_hash_out, bsk_digs[step])
    put(lay.lwe_hash_out, lwe_digs[step])
    put(lay.acc_in, np.asarray(accs[step]))
    if step > 0:
        put(lay.bsk_hash_in, bsk_digs[step - 1])
        put(lay.lwe_hash_in, lwe_digs[step - 1])
    if vk_pis is not None:
        put(lay.vk, vk_pis)
    return pis


def verified_pbs_fast(ct, testv, bsk, ksk, params: VpbsParams,
                      config: CircuitConfig = STANDARD_CONFIG,
                      batch_size: int = 8,
                      checkpoint_dir: str | None = None):
    """Prove one PBS with every step batched (native chain precompute).

    Returns (out_ct, proofs, step_circuit) — same contract as
    verified_pbs; verify with verify_pbs. ``checkpoint_dir``: persist
    each step proof (same step_{i}.bin format as verified_pbs) and skip
    already-proven steps on resume."""
    p = params
    sc = get_step_circuit(p, config)
    ct = np.asarray(ct, dtype=np.uint64)
    bsk_np = np.asarray(bsk)
    ksk_np = np.asarray(ksk)
    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])

    tt = TimingTree("verified_pbs_fast")
    with tt.scope("native chain"):
        accs, bsk_digs, lwe_digs = compute_chain(ct, testv, bsk, ksk, p)

    def make_pw(step: int) -> PartialWitness:
        pw = PartialWitness()
        sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
        pw.set_target(sc.t_counter, step + 1)
        if step == 0:
            g, mask = dummy, int(ct[p.n])
            hin = ([0] * 4, [0] * 4)
        elif step <= p.n:
            g, mask = bsk_np[step - 1], int(ct[step - 1])
            hin = (bsk_digs[step - 1], lwe_digs[step - 1])
        else:
            g, mask = ksk_np, 0
            hin = (bsk_digs[step - 1], lwe_digs[step - 1])
        sc.t_ggsw.assign(pw, g)
        pw.set_target(sc.t_mask, mask)
        sc.t_acc_in.assign(pw, np.asarray(accs[step]))
        pw.set_target_arr(sc.t_bsk_hash_in, np.array(hin[0], np.uint64))
        pw.set_target_arr(sc.t_lwe_hash_in, np.array(hin[1], np.uint64))
        # native PI values -> all sponge carry chains precomputed on the
        # host, so witness gen runs the batched (non-sequential) variant
        pw.set_target_arr(sc.data.pi_targets, step_pi_values(
            step, p, sc.layout, acc_init_vals, accs, bsk_digs, lwe_digs))
        pw.precompute_sponges(sc.data)
        return pw

    proofs = [None] * p.num_steps
    if checkpoint_dir:
        import os
        from ..prover.serialize import proof_to_bytes, proof_from_bytes
        os.makedirs(checkpoint_dir, exist_ok=True)
        for i in range(p.num_steps):
            path = os.path.join(checkpoint_dir, f"step_{i}.bin")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    proofs[i] = proof_from_bytes(f.read())
        done = sum(pr is not None for pr in proofs)
        if done:
            log.info("fast path: resuming — %d/%d step proofs on disk",
                     done, p.num_steps)
    todo = [i for i in range(p.num_steps) if proofs[i] is None]
    batches = [todo[s:s + batch_size]
               for s in range(0, len(todo), batch_size)]
    with tt.scope("batched proving"):
        # host witness prep of batch k+1 overlaps the device phases of
        # batch k (numpy + the C++ sponge runtime release the GIL, and
        # prove_batch blocks in device fetches)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=1) as ex:
            if batches:
                fut = ex.submit(
                    lambda ix=batches[0]: [make_pw(i) for i in ix])
            for bi, idxs in enumerate(batches):
                pws = fut.result()
                if bi + 1 < len(batches):
                    fut = ex.submit(
                        lambda ix=batches[bi + 1]: [make_pw(i) for i in ix])
                if len(pws) < batch_size and p.num_steps > batch_size:
                    # pad a partial batch (the 730 % 8 == 2 tail, or a
                    # short resume) with copies of its last witness
                    # (extra proofs discarded below): a second
                    # prove_batch SHAPE would recompile the whole
                    # pipeline (~10+ min cold on the remote service) —
                    # padding rides the batch_size compile instead
                    pws = pws + [pws[-1]] * (batch_size - len(pws))
                with tt.scope(f"steps {idxs[0]}..{idxs[-1]}"):
                    batch = prove_batch(sc.data, pws, timing=tt)
                for i, pr in zip(idxs, batch):
                    proofs[i] = pr
                    if checkpoint_dir:
                        path = os.path.join(checkpoint_dir,
                                            f"step_{i}.bin")
                        with open(path + ".tmp", "wb") as f:
                            f.write(proof_to_bytes(pr))
                        os.replace(path + ".tmp", path)
    tt.done()

    # consistency: circuit-produced chain values match the native ones
    lay = sc.layout
    final = proofs[-1]
    out = np.asarray(_pis(final, lay.latest_acc),
                     dtype=np.uint64).reshape(p.K, p.N)
    assert (out == np.asarray(accs[-1])).all(), \
        "circuit/native chain divergence"
    return jnp.asarray(out), proofs, sc
