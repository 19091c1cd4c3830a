"""Verifiable PBS: the universal step circuit + chained proving loop +
verifier (ref: src/vtfhe/ivc_based_vpbs.rs).

The reference chains the n+2 step proofs with plonky2 cyclic recursion:
each step circuit verifies the previous proof in-circuit, so the final
proof is O(1) (ivc_based_vpbs.rs:159-386). This module implements BOTH
modes over the same universal step core:

* **Cyclic recursion** (``verified_pbs_recursive``, the reference's
  mode): the step circuit embeds a full PLONK+FRI verifier of its own
  proof shape (ivc/verifier_circuit.py), the circuit size is found by
  fixpoint search instead of plonky2's hand-tuned NoopGate pad
  (ivc_based_vpbs.rs:54-57), and one O(1) proof attests the whole PBS.
* **Explicit chaining** (``verified_pbs``): every step exposes its
  chain-in fields (acc_in, hash-chain inputs) as public inputs and the
  verifier checks linkage plus each of the n+2 proofs — O(n) verifier,
  ~3x cheaper prover per step; the throughput mode when proofs are
  checked by a party that can afford n+2 verifications.

Base-case soundness (recursive mode): instead of plonky2's
conditionally_verify_cyclic_proof_or_dummy (ivc:268) — which SELECTS a
precomputed dummy proof into the verifier when condition=0 — every
verifier assertion here is gated on ``condition`` and the base step
assigns an all-zero proof body. A malicious prover could of course set
condition=0 mid-chain; that does not help them, because the chain-in
fields collapse WITH the same condition bit: counter becomes 1,
acc_in becomes acc_init, and both running hashes restart at 0 (the
``select(condition, ...)`` wiring at build_recursive_step_circuit).
Any such proof therefore claims exactly a length-(counter) suffix
chain started from the public acc_init — and the out-of-circuit
verifier rejects it because it checks counter == n+2 (ivc:433-436)
and the two hash chains must replay the full bsk / LWE-ct absorption
(counter steps of it) against the verifier's own recomputation. A
restart mid-chain can only LOWER the final counter below n+2 or break
the hash-chain equality; it can never forge a full-length chain.

One PBS = n+2 proofs of ONE universal circuit (built & preprocessed
once, cached): n blind-rotation CMUX steps, a first body-rotation step,
and a final key-switch step done as a GGSW external product with the
ksk (ivc_based_vpbs.rs:356-371 — the LevCt route exists as a gadget but
is unused here, matching the reference).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..crypto import poly as cpoly, lwe as clwe, glwe as cglwe, ggsw as cggsw
from ..circuit import CircuitBuilder, CircuitConfig, PartialWitness, \
    STANDARD_CONFIG
from ..gadgets import GlweCt, GgswCt, GlwePoly, glwe_select, rotate_glwe
from ..hashing import poseidon as HP
from ..prover import prove, preprocess, verify
from ..utils.timing import TimingTree

log = logging.getLogger("vfhe_tpu")

# chain length at which verify_pbs switches from the scalar verifier to
# the batched one (prover/verify_batch): below this a fresh jit of the
# batched pipeline costs more than the scalar loop it replaces
BATCH_VERIFY_MIN = 16


@dataclass(frozen=True)
class VpbsParams:
    """The reference's const-generic parameter set as a config object
    (ref: main.rs:22-30 for the paper values)."""
    n: int = 728          # LWE dimension
    N: int = 1024         # ring dimension
    K: int = 2            # GLWE size (k + 1)
    ELL: int = 4          # gadget length
    LOGB: int = 5         # gadget base bits
    p: int = 2            # plaintext modulus

    @property
    def num_steps(self) -> int:
        return self.n + 2


TEST_PARAMS = VpbsParams(n=1, N=8, K=2, ELL=8, LOGB=8, p=2)


@dataclass
class StepLayout:
    """Public-input index ranges of the step circuit (the reference
    computes the same ranges at ivc_based_vpbs.rs:196-207, 409-419).
    In recursive mode the layout gains a trailing verifier-data section
    (add_verifier_data_public_inputs equivalent, ivc_based_vpbs.rs:241)."""
    acc_init: tuple
    counter: int
    latest_acc: tuple
    bsk_hash_out: tuple
    lwe_hash_out: tuple
    acc_in: tuple
    bsk_hash_in: tuple
    lwe_hash_in: tuple
    vk: tuple = (0, 0)
    num_pis: int = 0

    @classmethod
    def make(cls, params: VpbsParams, vk_len: int = 0) -> "StepLayout":
        kn = params.K * params.N
        i = 0

        def take(sz):
            nonlocal i
            r = (i, i + sz)
            i += sz
            return r

        acc_init = take(kn)
        counter = take(1)[0]
        latest_acc = take(kn)
        bsk_hash_out = take(4)
        lwe_hash_out = take(4)
        acc_in = take(kn)
        bsk_hash_in = take(4)
        lwe_hash_in = take(4)
        vk = take(vk_len)
        return cls(acc_init, counter, latest_acc, bsk_hash_out, lwe_hash_out,
                   acc_in, bsk_hash_in, lwe_hash_in, vk, num_pis=i)


@dataclass
class StepCircuit:
    data: object
    layout: StepLayout
    params: VpbsParams
    # witness targets
    t_acc_init: object
    t_ggsw: object
    t_acc_in: object
    t_counter: int
    t_mask: int
    t_bsk_hash_in: np.ndarray
    t_lwe_hash_in: np.ndarray


def _build_step_core(b: CircuitBuilder, p: VpbsParams, acc_init, ggsw,
                     current_acc_in, counter, mask_element, bsk_hash_in,
                     lwe_hash_in):
    """The shared step computation + PI registration tail (ref:
    ivc_based_vpbs.rs:80-157). Caller must already have registered
    acc_init and counter (PI-layout order)."""
    first_step = b.is_equal(counter, b.one())
    last_step = b.is_equal(counter, b.constant(p.n + 2))

    # first step: the mask element is actually the body, negate it
    neg_mask = b.neg(mask_element)
    first_negated_mask = b.select(first_step, neg_mask, mask_element)

    shifted_glwe = rotate_glwe(b, current_acc_in, first_negated_mask)
    diff_glwe = shifted_glwe.sub(b, current_acc_in)
    xprod_in = glwe_select(b, last_step, current_acc_in, diff_glwe)
    xprod_out = ggsw.external_product(b, xprod_in, p.LOGB)

    # last step: plain external product (key switch), no cmux add.
    # select(last, xprod, xprod + acc) == xprod + (1-last)*acc — one
    # fused ARITH lane per coefficient instead of an add + a select.
    not_last = b.sub(b.one(), last_step)
    cmux_or_exprod = GlweCt([
        GlwePoly(b.mul_add_vec(
            np.full(p.N, not_last, dtype=np.int64),
            acc.coeffs, xp.coeffs))
        for xp, acc in zip(xprod_out.polys, current_acc_in.polys)])
    # first step: only the rotation
    current_acc_out = glwe_select(b, first_step, shifted_glwe, cmux_or_exprod)
    current_acc_out.register(b)

    bsk_hash_out = b.hash_n_to_hash_no_pad(
        np.concatenate([bsk_hash_in, ggsw.flatten()]))
    lwe_hash_out = b.hash_n_to_hash_no_pad(
        np.concatenate([lwe_hash_in, [mask_element]]))
    b.register_public_inputs(bsk_hash_out)
    b.register_public_inputs(lwe_hash_out)

    # chain-in fields exposed as PIs (the recursive verifier consumes the
    # inner proof's *out* fields against these)
    b.register_public_inputs(current_acc_in.flatten())
    b.register_public_inputs(bsk_hash_in)
    b.register_public_inputs(lwe_hash_in)


def build_step_circuit(b: CircuitBuilder, params: VpbsParams):
    """The universal step circuit, explicit-chaining variant (ref:
    ivc_based_vpbs.rs:80-157 without the recursion wiring)."""
    p = params
    acc_init = GlweCt.new_from_builder(b, p.N, p.K)
    ggsw = GgswCt.new_from_builder(b, p.N, p.K, p.ELL)
    acc_init.register(b)
    current_acc_in = GlweCt.new_from_builder(b, p.N, p.K)
    counter = b.add_virtual_public_input()
    mask_element = b.add_virtual_target()
    bsk_hash_in = b.add_virtual_hash()
    lwe_hash_in = b.add_virtual_hash()
    _build_step_core(b, p, acc_init, ggsw, current_acc_in, counter,
                     mask_element, bsk_hash_in, lwe_hash_in)
    return (mask_element, acc_init, ggsw, current_acc_in, counter,
            bsk_hash_in, lwe_hash_in)


# Known-good trace heights per gadget shape (N, K, ELL, LOGB): the row-
# packed results of rounds 2-3 (CLAUDE.md pitfall 7). Outgrowing one is
# NOT an error — compile_circuit falls back to the next power of two and
# proving continues — but every prover phase ~doubles, so it is LOUD.
# The strict row-budget tests (test_vpbs.py) stay as the regression
# tripwire that actually fails CI.
_KNOWN_STEP_BITS = {(1024, 2, 4, 5): 13}
_KNOWN_REC_BITS = {(1024, 2, 4, 5): 15}


def _warn_if_outgrown(kind: str, data, known_bits: int | None) -> None:
    if known_bits is not None and data.h > (1 << known_bits):
        log.warning(
            "%s circuit OUTGREW its known trace height: %d rows used > "
            "2^%d, proving at h=%d — every prover phase roughly doubles. "
            "Re-pack the new rows in-row (POS1/DECOMP/CSEL pattern, "
            "CLAUDE.md pitfall 7) instead of shipping this height.",
            kind, data.rows_used, known_bits, data.h)


def _pad_filler_rows(b: CircuitBuilder, pad_rows: int) -> None:
    """Append ``pad_rows`` trace rows of fresh CONST gates (4 unique
    constants per row). Used to exercise the power-of-two overflow
    fallback and for height-alignment experiments."""
    existing = set(b._const_map)
    vals, v = [], gl.P - 2
    while len(vals) < 4 * pad_rows:
        if v not in existing:
            vals.append(v)
            existing.add(v)
        v -= 1
    b.constants(np.array(vals, dtype=np.uint64))


@functools.lru_cache(maxsize=4)
def get_step_circuit(params: VpbsParams,
                     config: CircuitConfig = STANDARD_CONFIG,
                     pad_rows: int = 0) -> StepCircuit:
    b = CircuitBuilder(config)
    (mask, acc_init, ggsw, acc_in, counter, bsk_in, lwe_in) = \
        build_step_circuit(b, params)
    if pad_rows:
        _pad_filler_rows(b, pad_rows)
    data = b.build()
    log.info("step circuit: %d rows used, h=%d, %d targets",
             data.rows_used, data.h, data.num_targets)
    _warn_if_outgrown("step", data,
                      _KNOWN_STEP_BITS.get((params.N, params.K,
                                            params.ELL, params.LOGB)))
    return StepCircuit(data=data, layout=StepLayout.make(params),
                       params=params, t_acc_init=acc_init, t_ggsw=ggsw,
                       t_acc_in=acc_in, t_counter=counter, t_mask=mask,
                       t_bsk_hash_in=bsk_in, t_lwe_hash_in=lwe_in)


def _pis(proof, rng) -> np.ndarray:
    return proof.public_inputs[rng[0]:rng[1]]


# ---------------------------------------------------------------------------
# cyclic recursion: the IVC step circuit that verifies proofs of ITSELF
# (ref: ivc_based_vpbs.rs:159-386, esp. the cyclic wiring at :209-273)
# ---------------------------------------------------------------------------

def predict_gates(params: VpbsParams, config: CircuitConfig) -> list:
    """The recursive step circuit's gate set, known before building (the
    cyclic fixpoint needs the selector count up front — the reference's
    analogue is common_data_for_recursion's fixed gate list,
    ivc_based_vpbs.rs:30-62). Row order in circuit/compile.py determines
    selector indices: ARITH, SELECT, DOT (asc keys), CSEL (pos, neg),
    BASESUM (asc widths), BASESUM_CANON (asc widths), DECOMP (asc keys),
    NTTBF/NTTBF_INV, NTTBF4/NTTBF4_INV, POS1, CONST, PI."""
    from ..circuit.builder import (ARITH, BASESUM, BASESUM_CANON, SELECT,
                                   NTTBF, NTTBF_INV, NTTBF4, NTTBF4_INV,
                                   DOT, CSEL, CSEL_LANES, dot_lanes,
                                   DECOMP, NTTBF_LANES, NTTBF4_LANES,
                                   POS1, CONST, PI, GateInstance)
    # Discover the step circuit's gate inventory by dry-building it
    # (cheap relative to a proof); union with the recursive verifier's
    # own widths: 64-bit canonical splits (PoW + query indices).
    probe = CircuitBuilder(config)
    build_step_circuit(probe, params)
    widths = sorted(probe._basesum.keys())
    canon_widths = sorted(set(probe._basesum_canon.keys()) | {64})
    decomp_keys = sorted(probe._decomp.keys())
    nttbf_kinds = sorted(probe._nttbf.keys())
    nttbf4_kinds = sorted(probe._nttbf4.keys())
    dot_keys = sorted(probe._dot.keys())
    csel_kinds = sorted(probe._csel.keys())
    gates = []

    def g(kind, param=0):
        lanes = 1
        if kind == BASESUM:
            lanes = max(1, config.num_routed_wires // (param + 1))
        elif kind == BASESUM_CANON:
            lanes = max(1, config.num_routed_wires // (param + 5))
        elif kind in (NTTBF, NTTBF_INV):
            lanes = NTTBF_LANES
        elif kind in (NTTBF4, NTTBF4_INV):
            lanes = NTTBF4_LANES
        elif kind == DOT:
            lanes = dot_lanes(config.num_routed_wires, param & 0xFF)
        elif kind == CSEL:
            lanes = CSEL_LANES
        gates.append(GateInstance(kind=kind, param=param,
                                  selector=len(gates), lanes=lanes))

    g(ARITH)
    g(SELECT)
    for mask, J in dot_keys:
        g(DOT, (mask << 8) | J)
    for neg in csel_kinds:
        g(CSEL, int(neg))
    for w in widths:
        g(BASESUM, w)
    for w in canon_widths:
        g(BASESUM_CANON, w)
    for nbits, logb in decomp_keys:
        g(DECOMP, (nbits << 8) | logb)
    for inv in nttbf_kinds:
        g(NTTBF_INV if inv else NTTBF)
    for inv in nttbf4_kinds:
        g(NTTBF4_INV if inv else NTTBF4)
    g(POS1)
    g(CONST)
    g(PI)
    return gates


@dataclass
class RecStepCircuit:
    data: object
    layout: StepLayout
    params: VpbsParams
    shape: object
    t_acc_init: object
    t_ggsw: object
    t_mask: int
    t_condition: int
    t_proof: object           # ProofTarget for the inner proof
    t_vk_cap: np.ndarray
    t_vk_digest: np.ndarray
    # (stage1, stage2) host witness fns split at the proof-body taint
    # boundary — lets step t+1's FHE-core witness run while step t's
    # device phases are in flight (CLAUDE.md round-3 queue item 2)
    staged_witness: tuple = None
    # stage-2 as bounded sequential DEVICE jits (the remote TPU compile
    # service rejects the monolithic graph; chunks compile) — opt-in
    # via verified_pbs_recursive(stage2_device_chunks=)
    staged_device_stage2: object = None


def build_recursive_step_circuit(b: CircuitBuilder, params: VpbsParams,
                                 shape, gates, lay: StepLayout):
    """Step circuit + in-circuit verification of the previous step's
    proof (the verified_pbs circuit wiring, ivc_based_vpbs.rs:209-273).

    Base-case handling: instead of plonky2's select-a-dummy-proof
    (conditionally_verify_cyclic_proof_or_dummy), every verifier
    assertion is gated on ``condition``; with condition=0 the prover
    assigns an all-zero proof and the chain-in fields collapse to the
    base values (counter=1, acc_in=acc_init, hash_ins=0)."""
    from .proof_target import ProofTarget
    from .verifier_circuit import verify_proof_circuit
    p = params
    kn = p.K * p.N

    acc_init = GlweCt.new_from_builder(b, p.N, p.K)
    ggsw = GgswCt.new_from_builder(b, p.N, p.K, p.ELL)
    acc_init.register(b)
    mask_element = b.add_virtual_target()
    condition = b.add_virtual_bool_target_safe()
    pt = ProofTarget.allocate(b, shape)

    ipis = pt.public_inputs
    i_acc_init = ipis[lay.acc_init[0]:lay.acc_init[1]]
    i_counter = int(ipis[lay.counter])
    i_latest = ipis[lay.latest_acc[0]:lay.latest_acc[1]]
    i_bskh = ipis[lay.bsk_hash_out[0]:lay.bsk_hash_out[1]]
    i_lweh = ipis[lay.lwe_hash_out[0]:lay.lwe_hash_out[1]]
    i_vk = ipis[lay.vk[0]:lay.vk[1]]

    # counter = condition ? inner_counter + 1 : 1   (ivc:245-252)
    counter = b.select(condition, b.add(i_counter, b.one()), b.one())
    b.register_public_input(counter)

    # chain-in fields derived from the inner proof / base values (ivc:236-266)
    cvec = np.full(kn, condition, dtype=np.int64)
    acc_in_flat = b.select_vec(cvec, i_latest, acc_init.flatten())
    current_acc_in = GlweCt.new_from_targets(acc_in_flat, p.N, p.K)
    z4 = np.full(4, b.zero(), dtype=np.int64)
    c4 = np.full(4, condition, dtype=np.int64)
    bsk_hash_in = b.select_vec(c4, i_bskh, z4)
    lwe_hash_in = b.select_vec(c4, i_lweh, z4)

    _build_step_core(b, p, acc_init, ggsw, current_acc_in, counter,
                     mask_element, bsk_hash_in, lwe_hash_in)

    # verifier data as public inputs (add_verifier_data_public_inputs)
    cap_size = shape.cap_size
    vk_cap = b.add_virtual_targets(cap_size * 4).reshape(cap_size, 4)
    vk_digest = b.add_virtual_targets(4)
    b.register_public_inputs(vk_cap.ravel())
    b.register_public_inputs(vk_digest)

    # the inner proof must claim the same acc_init and the same verifier
    # key (the chain propagates both unchanged)
    b.cond_assert_eq_vec(condition, i_acc_init, acc_init.flatten())
    b.cond_assert_eq_vec(
        condition, i_vk,
        np.concatenate([vk_cap.ravel(), np.asarray(vk_digest)]))

    verify_proof_circuit(b, shape, gates, pt, vk_cap, vk_digest, condition)
    return (acc_init, ggsw, mask_element, condition, pt, vk_cap, vk_digest)


@functools.lru_cache(maxsize=2)
def get_recursive_step_circuit(params: VpbsParams,
                               config: CircuitConfig = STANDARD_CONFIG,
                               min_degree_bits: int = 0) -> RecStepCircuit:
    """Build the self-verifying step circuit, searching the row-count
    fixpoint (the reference hand-tunes 2^12/2^15 NoopGate padding,
    ivc_based_vpbs.rs:54-57; here the shape assumption is checked after
    build and bumped until it holds)."""
    from .proof_target import ProofShape
    gates = predict_gates(params, config)
    cap_size = 1 << config.cap_height
    lay = StepLayout.make(params, vk_len=cap_size * 4 + 4)
    k = max(min_degree_bits, 12)
    for _attempt in range(6):
        shape = ProofShape(config=config, h=1 << k, num_pis=lay.num_pis,
                           num_selectors=len(gates))
        b = CircuitBuilder(config)
        (acc_init, ggsw, mask, condition, pt, vk_cap, vk_digest) = \
            build_recursive_step_circuit(b, params, shape, gates, lay)
        est = b.num_gates()
        if est > (1 << k):
            # won't fit — bump without paying a full compile
            k = max(k + 1, (est - 1).bit_length())
            log.info("fixpoint: %d rows > 2^%d, growing", est, k - 1)
            continue
        data = b.build(min_rows=1 << k, witness_host=True)
        if data.h != 1 << k:
            k = data.degree_bits
            log.info("fixpoint: built h=2^%d, retrying", k)
            continue
        got = [(g.kind, g.param) for g in data.gates]
        want = [(g.kind, g.param) for g in gates]
        assert got == want, f"gate-set drift: {got} != {want}"
        log.info("recursive step circuit: %d rows used, h=%d, %d targets",
                 data.rows_used, data.h, data.num_targets)
        _warn_if_outgrown("recursive step", data,
                          _KNOWN_REC_BITS.get((params.N, params.K,
                                               params.ELL, params.LOGB)))
        from ..circuit.compile import (compile_witness_staged,
                                       compile_witness_device_chunked)
        staged = compile_witness_staged(b, data, pt.body_indices())
        dev2 = compile_witness_device_chunked(b, data,
                                              ops=staged[1].ops,
                                              n_chunks=12)
        return RecStepCircuit(
            data=data, layout=lay, params=params, shape=shape,
            t_acc_init=acc_init, t_ggsw=ggsw, t_mask=mask,
            t_condition=condition, t_proof=pt, t_vk_cap=vk_cap,
            t_vk_digest=vk_digest, staged_witness=staged,
            staged_device_stage2=dev2)
    raise RuntimeError("recursion fixpoint did not converge")


def verified_pbs(ct, testv, bsk, ksk, params: VpbsParams,
                 config: CircuitConfig = STANDARD_CONFIG,
                 debug_glwe_key=None, debug_lwe_key=None, debug_ksk_key=None,
                 checkpoint_dir: str | None = None):
    """Prove one PBS as a chain of n+2 step proofs
    (ref: ivc_based_vpbs.rs:159-386).

    ``checkpoint_dir``: step-granular persistence/resume — the chain state
    after step t is just (proof_t), so a crashed run resumes at the first
    missing step (SURVEY.md section 5 "naturally checkpointable").

    Returns (out_ct, proofs, step_circuit)."""
    import os
    from ..prover.serialize import proof_to_bytes, proof_from_bytes
    p = params
    sc = get_step_circuit(p, config)
    lay = sc.layout
    ct = np.asarray(ct, dtype=np.uint64)
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))

    testv_check = jnp.asarray(testv)
    ct_switched = np.asarray(clwe.mod_switch_ct(jnp.asarray(ct), p.N))

    # native chain values: resolve every witness sponge's carry chain on
    # the host up front (the bsk/PI absorbs are the latency floor
    # otherwise — CLAUDE.md "witness-phase sync")
    from .fastpath import compute_chain, step_pi_values
    accs, bsk_digs, lwe_digs = compute_chain(ct, testv, bsk, ksk, p)

    proofs = []
    prev = None
    start_step = 0
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        while start_step < p.num_steps:
            path = os.path.join(checkpoint_dir, f"step_{start_step}.bin")
            if not os.path.exists(path):
                break
            with open(path, "rb") as f:
                prev = proof_from_bytes(f.read())
            proofs.append(prev)
            start_step += 1
        if start_step:
            log.info("resuming from checkpoint at step %d", start_step)

    for step in range(start_step, p.num_steps):
        pw = PartialWitness()
        sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
        pw.set_target(sc.t_counter, step + 1)
        if step == 0:
            ggsw_vals, mask_val = dummy, int(ct[p.n])
            acc_in_vals = acc_init_vals
            hash_ins = (np.zeros(4, np.uint64), np.zeros(4, np.uint64))
        elif step <= p.n:
            ggsw_vals, mask_val = np.asarray(bsk[step - 1]), int(ct[step - 1])
            acc_in_vals = _pis(prev, lay.latest_acc)
            hash_ins = (_pis(prev, lay.bsk_hash_out),
                        _pis(prev, lay.lwe_hash_out))
        else:  # key switch
            ggsw_vals, mask_val = np.asarray(ksk), 0
            acc_in_vals = _pis(prev, lay.latest_acc)
            hash_ins = (_pis(prev, lay.bsk_hash_out),
                        _pis(prev, lay.lwe_hash_out))
        sc.t_ggsw.assign(pw, ggsw_vals)
        pw.set_target(sc.t_mask, mask_val)
        sc.t_acc_in.assign(pw, np.asarray(acc_in_vals,
                                          dtype=np.uint64).reshape(p.K, p.N))
        pw.set_target_arr(sc.t_bsk_hash_in, hash_ins[0])
        pw.set_target_arr(sc.t_lwe_hash_in, hash_ins[1])
        pw.set_target_arr(sc.data.pi_targets, step_pi_values(
            step, p, lay, acc_init_vals, accs, bsk_digs, lwe_digs))
        pw.precompute_sponges(sc.data)

        tt = TimingTree(f"prove step {step}")
        proof = prove(sc.data, pw, timing=tt)
        tt.done()
        proofs.append(proof)
        prev = proof
        if checkpoint_dir:
            path = os.path.join(checkpoint_dir, f"step_{step}.bin")
            with open(path + ".tmp", "wb") as f:
                f.write(proof_to_bytes(proof))
            os.replace(path + ".tmp", path)

        # per-step noise telemetry (ref: ivc:314-321, 341-352)
        if debug_glwe_key is not None:
            if step == 0:
                testv_check = cpoly.left_shift(testv_check,
                                               int(ct_switched[p.n]))
            elif step <= p.n:
                sk = int(np.asarray(debug_lwe_key)[step - 1])
                testv_check = cpoly.right_shift(
                    testv_check, int(ct_switched[step - 1]) * sk)
            acc = jnp.asarray(np.asarray(_pis(prev, lay.latest_acc),
                                         dtype=np.uint64).reshape(p.K, p.N))
            key = debug_ksk_key if step == p.n + 1 else debug_glwe_key
            log.info("step %d avg error: %.3e  max error: %.3e", step,
                     cglwe.get_avg_error(acc, key, testv_check),
                     cglwe.get_max_error(acc, key, testv_check))

    out = np.asarray(_pis(prev, lay.latest_acc),
                     dtype=np.uint64).reshape(p.K, p.N)
    return jnp.asarray(out), proofs, sc


def verified_pbs_recursive(ct, testv, bsk, ksk, params: VpbsParams,
                           config: CircuitConfig = STANDARD_CONFIG,
                           debug_glwe_key=None, debug_lwe_key=None,
                           debug_ksk_key=None,
                           checkpoint_dir: str | None = None,
                           min_degree_bits: int = 0,
                           stage2_device: bool = False):
    """Prove one PBS as a cyclic IVC chain: each step proof verifies the
    previous one in-circuit, so ONE O(1) proof attests the whole
    bootstrapping (ref: ivc_based_vpbs.rs:159-386).

    ``stage2_device``: run the stage-2 (proof-body-dependent) witness
    ops as bounded sequential jits on the DEFAULT device instead of the
    host CPU backend — attacks the ~2 s/step CPU witness bottleneck at
    paper shape; the monolithic graph is rejected by the remote TPU
    compile service but the chunks compile (see
    compile_witness_device_chunked).

    Returns (out_ct, final_proof, rec_step_circuit)."""
    import os
    from ..prover.serialize import proof_to_bytes, proof_from_bytes
    p = params
    sc = get_recursive_step_circuit(p, config, min_degree_bits)
    lay = sc.layout
    vk = preprocess(sc.data)["vk"]
    vk_pis = np.concatenate([np.asarray(vk.preproc_cap, np.uint64).ravel(),
                             np.asarray(vk.circuit_digest, np.uint64)])
    ct = np.asarray(ct, dtype=np.uint64)
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))

    testv_check = jnp.asarray(testv)
    ct_switched = np.asarray(clwe.mod_switch_ct(jnp.asarray(ct), p.N))

    # native chain values: with the full PI vector assigned, every
    # witness sponge resolves host-side — including the in-circuit
    # challenger's duplex chain over the assigned inner proof (the
    # recursive fastpath: the transcript replays natively, so witness
    # generation runs the batched variant)
    from .fastpath import compute_chain, step_pi_values
    accs, bsk_digs, lwe_digs = compute_chain(ct, testv, bsk, ksk, p)

    prev = None
    start_step = 0
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        while start_step < p.num_steps:
            path = os.path.join(checkpoint_dir, f"rstep_{start_step}.bin")
            if not os.path.exists(path):
                break
            with open(path, "rb") as f:
                prev = proof_from_bytes(f.read())
            start_step += 1
        if start_step:
            log.info("resuming recursive chain at step %d", start_step)

    # staged-witness overlap: everything about step t's witness that
    # doesn't need the inner proof's BODY — assignments, the natively
    # predicted inner PIs, phase-A sponge carries, and the stage-1 (FHE
    # core) CPU evaluation — runs on a worker thread while step t-1's
    # device phases are still in flight. Only the in-circuit-verifier
    # ops (stage 2) wait for the actual proof.
    from concurrent.futures import ThreadPoolExecutor
    stage1_fn, stage2_fn = sc.staged_witness

    def prep_stage1(step: int):
        pw = PartialWitness()
        sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
        if step == 0:
            ggsw_vals, mask_val = dummy, int(ct[p.n])
        elif step <= p.n:
            ggsw_vals, mask_val = np.asarray(bsk[step - 1]), int(ct[step - 1])
        else:  # key switch
            ggsw_vals, mask_val = np.asarray(ksk), 0
        sc.t_ggsw.assign(pw, ggsw_vals)
        pw.set_target(sc.t_mask, mask_val)
        pw.set_bool_target(sc.t_condition, step > 0)
        pred_inner_pis = None
        if step == 0:
            sc.t_proof.assign_dummy(pw)
        else:
            # the inner proof's PIs are exactly step t-1's PI vector,
            # which the native chain already knows (fastpath)
            pred_inner_pis = step_pi_values(
                step - 1, p, lay, acc_init_vals, accs, bsk_digs, lwe_digs,
                vk_pis=vk_pis)
            pw.set_target_arr(sc.t_proof.public_inputs, pred_inner_pis)
        pw.set_target_arr(sc.t_vk_cap, vk.preproc_cap)
        pw.set_target_arr(sc.t_vk_digest, vk.circuit_digest)
        pw.set_target_arr(sc.data.pi_targets, step_pi_values(
            step, p, lay, acc_init_vals, accs, bsk_digs, lwe_digs,
            vk_pis=vk_pis))
        pw.precompute_sponges(sc.data, strict=False)      # phase A
        n_chunks = len(pw._chunks)
        w1 = stage1_fn(pw.initial_vector(sc.data))
        return pw, w1, n_chunks, pred_inner_pis

    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(prep_stage1, start_step)
        for step in range(start_step, p.num_steps):
            tt = TimingTree(f"prove step {step}")
            with tt.scope("witness stage2"):
                pw, w1, n1, pred_pis = fut.result()
                if step > 0:
                    assert np.array_equal(
                        np.asarray(prev.public_inputs, np.uint64),
                        np.asarray(pred_pis, np.uint64)), \
                        "native chain diverged from the proven PIs"
                    sc.t_proof.assign(pw, prev)           # the body
                    pw.precompute_sponges(sc.data, strict=False)  # phase B
                assert pw.sponges_precomputed
                for idx, val in pw._chunks[n1:]:
                    w1[idx] = val
                if stage2_device and sc.staged_device_stage2 is not None:
                    w = sc.staged_device_stage2(jnp.asarray(w1))
                else:
                    w = stage2_fn(w1)
            if step + 1 < p.num_steps:
                fut = ex.submit(prep_stage1, step + 1)
            proof = prove(sc.data, pw, timing=tt, witness=w)
            tt.done()
            prev = proof
            if checkpoint_dir:
                path = os.path.join(checkpoint_dir, f"rstep_{step}.bin")
                with open(path + ".tmp", "wb") as f:
                    f.write(proof_to_bytes(proof))
                os.replace(path + ".tmp", path)

            if debug_glwe_key is not None:
                if step == 0:
                    testv_check = cpoly.left_shift(testv_check,
                                                   int(ct_switched[p.n]))
                elif step <= p.n:
                    sk = int(np.asarray(debug_lwe_key)[step - 1])
                    testv_check = cpoly.right_shift(
                        testv_check, int(ct_switched[step - 1]) * sk)
                acc = jnp.asarray(np.asarray(
                    _pis(prev, lay.latest_acc),
                    dtype=np.uint64).reshape(p.K, p.N))
                key = debug_ksk_key if step == p.n + 1 else debug_glwe_key
                log.info("step %d avg error: %.3e  max error: %.3e", step,
                         cglwe.get_avg_error(acc, key, testv_check),
                         cglwe.get_max_error(acc, key, testv_check))
    finally:
        ex.shutdown(wait=True, cancel_futures=True)

    out = np.asarray(_pis(prev, lay.latest_acc),
                     dtype=np.uint64).reshape(p.K, p.N)
    return jnp.asarray(out), prev, sc


def verify_pbs_recursive(out_ct, ct, testv, bsk, ksk, proof,
                         sc: RecStepCircuit) -> None:
    """Verify ONE recursive PBS proof — the reference's verifier shape
    (ivc_based_vpbs.rs:388-489): one proof verification, the cyclic
    verifier-data check, and the two native hash-chain recomputations."""
    p = sc.params
    lay = sc.layout
    ct = np.asarray(ct, dtype=np.uint64)
    vk = preprocess(sc.data)["vk"]

    tt = TimingTree("verify")
    # claimed test vector: zero mask + testv coefficients (ivc:421-431)
    claimed_testv = _pis(proof, lay.acc_init)
    assert (claimed_testv[:p.N * (p.K - 1)] == 0).all()
    assert (claimed_testv[p.N * (p.K - 1):] ==
            np.asarray(testv, dtype=np.uint64)).all()
    # counter == n + 2 (ivc:433-436)
    assert int(proof.public_inputs[lay.counter]) == p.num_steps, \
        "wrong number of steps"
    # claimed output (ivc:438-440)
    assert (np.asarray(out_ct, dtype=np.uint64).reshape(-1) ==
            _pis(proof, lay.latest_acc)).all()

    with tt.scope("verifying proof"):                      # ivc:442-447
        # paper-scale runs go through the BATCH=1 tensorized verifier:
        # its compiled executable persists on disk (verify_batch AOT
        # cache), so a cold process with a warm cache verifies in well
        # under a second instead of re-paying ~10 s of scalar-verifier
        # jit compiles (VERDICT round 4 next #5). Toy shapes (the test
        # suite, which disables the AOT cache) keep the scalar
        # verifier — a fresh B=1 trace would cost more than it saves.
        from ..prover.verify_batch import has_aot_entry, verify_batch
        if has_aot_entry(vk, 1) or p.N >= 1024:
            verify_batch(vk, [proof])
        else:
            verify(vk, proof)
    with tt.scope("verifying verifier data"):              # ivc:448-452
        vk_pis = np.concatenate(
            [np.asarray(vk.preproc_cap, np.uint64).ravel(),
             np.asarray(vk.circuit_digest, np.uint64)])
        assert (_pis(proof, lay.vk) == vk_pis).all(), \
            "cyclic verifier data mismatch"

    # hash chains bind the bsk / ksk and the LWE ciphertext (ivc:459-481)
    bsk_host = np.asarray(bsk)   # ONE device fetch, not n per-row
    #                              round-trips (CLAUDE.md pitfall 5)
    bsk_data = [np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL)).reshape(-1)]
    lwe_data = [[int(ct[p.n])]]
    for i in range(p.n):
        bsk_data.append(bsk_host[i].reshape(-1))
        lwe_data.append([int(ct[i])])
    bsk_data.append(np.asarray(ksk).reshape(-1))
    lwe_data.append([0])
    assert verify_hash_output(bsk_data, _pis(proof, lay.bsk_hash_out)), \
        "bsk hash chain mismatch"
    with tt.scope("verifying lwe hash chain"):
        assert verify_hash_output(lwe_data, _pis(proof, lay.lwe_hash_out)), \
            "lwe hash chain mismatch"
    tt.done()
    log.info("number of steps: %d", p.num_steps)
    log.info("proof size: %d bytes (O(1) — one proof for the whole PBS)",
             proof.num_bytes())


def verified_pbs_recursive_batch(cts, testv, bsk, ksk,
                                 params: VpbsParams,
                                 config: CircuitConfig = STANDARD_CONFIG,
                                 min_degree_bits: int = 0,
                                 stage2_device: bool = False,
                                 checkpoint_dir: str | None = None):
    """B independent cyclic-IVC chains in lock-step: every ciphertext's
    step-t recursive proof comes from ONE ``prove_batch`` call (the IVC
    chain is sequential per ciphertext, but across ciphertexts step
    proofs are independent — SURVEY.md section 7). Returns
    (out_cts (B,K,N), [final_proof]*B, sc): one O(1) proof per
    ciphertext, each verified by :func:`verify_pbs_recursive`.
    ``checkpoint_dir``: persist every step's B proofs
    (rstep_{step}_b{b}.bin) and resume a killed run at the last
    complete step."""
    from ..prover.batch import prove_batch
    from .fastpath import compute_chain, compute_bsk_digests, step_pi_values
    p = params
    cts = np.asarray(cts, dtype=np.uint64)
    B = cts.shape[0]
    sc = get_recursive_step_circuit(p, config, min_degree_bits)
    vk = preprocess(sc.data)["vk"]
    vk_pis = np.concatenate([np.asarray(vk.preproc_cap, np.uint64).ravel(),
                             np.asarray(vk.circuit_digest, np.uint64)])
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))

    # native chain values per ciphertext (bsk digests shared) -> full PI
    # assignment -> every sponge incl. the challenger chain precomputes
    bsk_digs_shared = compute_bsk_digests(bsk, ksk, p)
    natives = [compute_chain(cts[b], testv, bsk, ksk, p,
                             bsk_digs=bsk_digs_shared) for b in range(B)]

    # staged-witness overlap (same scheme as verified_pbs_recursive):
    # stage 1 of step t+1's B witnesses — assignments, the natively
    # predicted inner PIs, phase-A sponges, and the FHE-core ops — runs
    # on a prefetch thread while step t's device phases are in flight;
    # only the inner-proof body + phase-B sponges + stage-2 ops wait.
    from concurrent.futures import ThreadPoolExecutor
    stage1_fn, stage2_fn = sc.staged_witness

    def prep_stage1(step: int) -> list:
        if step == 0:
            ggsw_vals = dummy
        elif step <= p.n:
            ggsw_vals = np.asarray(bsk[step - 1])
        else:
            ggsw_vals = np.asarray(ksk)
        out = []
        for b in range(B):
            pw = PartialWitness()
            sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
            sc.t_ggsw.assign(pw, ggsw_vals)
            mask_val = (int(cts[b, p.n]) if step == 0
                        else int(cts[b, step - 1]) if step <= p.n else 0)
            pw.set_target(sc.t_mask, mask_val)
            pw.set_bool_target(sc.t_condition, step > 0)
            n_accs, n_bskd, n_lwed = natives[b]
            pred = None
            if step == 0:
                sc.t_proof.assign_dummy(pw)
            else:
                # the inner proof's PIs are step t-1's PI vector, which
                # the native chain already knows (fastpath)
                pred = step_pi_values(step - 1, p, sc.layout,
                                      acc_init_vals, n_accs, n_bskd,
                                      n_lwed, vk_pis=vk_pis)
                pw.set_target_arr(sc.t_proof.public_inputs, pred)
            pw.set_target_arr(sc.t_vk_cap, vk.preproc_cap)
            pw.set_target_arr(sc.t_vk_digest, vk.circuit_digest)
            pw.set_target_arr(sc.data.pi_targets, step_pi_values(
                step, p, sc.layout, acc_init_vals, n_accs, n_bskd, n_lwed,
                vk_pis=vk_pis))
            pw.precompute_sponges(sc.data, strict=False)       # phase A
            n1 = len(pw._chunks)
            w1 = stage1_fn(pw.initial_vector(sc.data))
            out.append((pw, w1, n1, pred))
        return out

    prevs = [None] * B
    start_step = 0
    if checkpoint_dir:
        import os
        from ..prover.serialize import proof_to_bytes, proof_from_bytes
        os.makedirs(checkpoint_dir, exist_ok=True)
        while start_step < p.num_steps:
            paths = [os.path.join(checkpoint_dir,
                                  f"rstep_{start_step}_b{b}.bin")
                     for b in range(B)]
            if not all(os.path.exists(q) for q in paths):
                break
            with_loaded = []
            for q in paths:
                with open(q, "rb") as f:
                    with_loaded.append(proof_from_bytes(f.read()))
            prevs = with_loaded
            start_step += 1
        if start_step:
            log.info("recursive batch: resuming — %d/%d steps on disk",
                     start_step, p.num_steps)
    prefetch = ThreadPoolExecutor(max_workers=1)
    pool = ThreadPoolExecutor(max_workers=3)    # per-instance stage 2
    try:
        if start_step < p.num_steps:
            fut = prefetch.submit(prep_stage1, start_step)
        for step in range(start_step, p.num_steps):
            tt = TimingTree(f"prove rec step {step} (batch {B})")
            with tt.scope("witness stage2"):
                preps = fut.result()

                def finish(args):
                    (pw, w1, n1, pred), prev = args
                    if pred is not None:
                        assert np.array_equal(
                            np.asarray(prev.public_inputs, np.uint64),
                            np.asarray(pred, np.uint64)), \
                            "native chain diverged from the proven PIs"
                        sc.t_proof.assign(pw, prev)        # the body
                        pw.precompute_sponges(sc.data, strict=False)  # B
                    assert pw.sponges_precomputed
                    for idx, val in pw._chunks[n1:]:
                        w1[idx] = val
                    return pw, stage2_fn(w1)

                if stage2_device and sc.staged_device_stage2 is not None:
                    # scatter on the host per instance, then ONE
                    # vmapped chunked stage-2 pass on the device
                    scattered = []
                    for (pw, w1, n1, pred), prev in zip(preps, prevs):
                        if pred is not None:
                            assert np.array_equal(
                                np.asarray(prev.public_inputs, np.uint64),
                                np.asarray(pred, np.uint64)), \
                                "native chain diverged from the proven PIs"
                            sc.t_proof.assign(pw, prev)
                            pw.precompute_sponges(sc.data, strict=False)
                        assert pw.sponges_precomputed
                        for idx, val in pw._chunks[n1:]:
                            w1[idx] = val
                        scattered.append(w1)
                    pws = [d[0] for d in preps]
                    W = sc.staged_device_stage2.batch(np.stack(scattered))
                else:
                    done = list(pool.map(finish, zip(preps, prevs)))
                    pws = [d[0] for d in done]
                    W = np.stack([d[1] for d in done])
            if step + 1 < p.num_steps:
                fut = prefetch.submit(prep_stage1, step + 1)
            prevs = prove_batch(sc.data, pws, timing=tt, witness=W)
            if checkpoint_dir:
                for b, pr in enumerate(prevs):
                    path = os.path.join(checkpoint_dir,
                                        f"rstep_{step}_b{b}.bin")
                    with open(path, "wb") as f:
                        f.write(proof_to_bytes(pr))
            tt.done()
    finally:
        prefetch.shutdown(wait=True, cancel_futures=True)
        pool.shutdown(wait=True)

    outs = np.stack([_pis(prev, sc.layout.latest_acc).reshape(p.K, p.N)
                     for prev in prevs])
    return jnp.asarray(outs), prevs, sc


def verified_pbs_batch(cts, testv, bsk, ksk, params: VpbsParams,
                       config: CircuitConfig = STANDARD_CONFIG,
                       mesh=None):
    """Prove B independent PBS chains in lock-step: all ciphertexts' step
    t proofs are produced by ONE batched prover call (vfhe_tpu.prover.
    batch) — the proofs/s scaling axis (SURVEY.md section 7: parallelism
    across independent ciphertexts, since the chain itself is
    sequential).

    ``cts``: (B, n+1) LWE ciphertexts under the same key material.
    ``mesh``: optional jax.sharding.Mesh — each prove_batch call runs
    SPMD with the batch on the mesh's ``dp`` axis (prover.batch pins
    every device stage to it).
    Returns (out_cts (B, K, N), proofs_per_instance: list of B lists, sc).
    """
    from ..prover.batch import prove_batch
    p = params
    sc = get_step_circuit(p, config)
    lay = sc.layout
    cts = np.asarray(cts, dtype=np.uint64)
    B = cts.shape[0]
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    dummy = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))
    bsk_np = np.asarray(bsk)
    ksk_np = np.asarray(ksk)

    from .fastpath import compute_chain, compute_bsk_digests, step_pi_values
    bsk_digs_shared = compute_bsk_digests(bsk, ksk, p)
    natives = [compute_chain(cts[bi], testv, bsk, ksk, p,
                             bsk_digs=bsk_digs_shared) for bi in range(B)]

    def make_step_pws(step: int) -> list:
        # every witness value comes from the native chain (bit-identical
        # to the previous proof's PIs — asserted downstream), so step
        # t+1's prep can overlap step t's device phases
        pws = []
        for bi in range(B):
            pw = PartialWitness()
            n_accs, n_bskd, n_lwed = natives[bi]
            sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
            pw.set_target(sc.t_counter, step + 1)
            if step == 0:
                ggsw_vals, mask_val = dummy, int(cts[bi, p.n])
                hash_ins = (np.zeros(4, np.uint64), np.zeros(4, np.uint64))
            elif step <= p.n:
                ggsw_vals = bsk_np[step - 1]
                mask_val = int(cts[bi, step - 1])
                hash_ins = (np.asarray(n_bskd[step - 1], dtype=np.uint64),
                            np.asarray(n_lwed[step - 1], dtype=np.uint64))
            else:
                ggsw_vals, mask_val = ksk_np, 0
                hash_ins = (np.asarray(n_bskd[step - 1], dtype=np.uint64),
                            np.asarray(n_lwed[step - 1], dtype=np.uint64))
            sc.t_ggsw.assign(pw, ggsw_vals)
            pw.set_target(sc.t_mask, mask_val)
            sc.t_acc_in.assign(pw, np.asarray(n_accs[step]))
            pw.set_target_arr(sc.t_bsk_hash_in, hash_ins[0])
            pw.set_target_arr(sc.t_lwe_hash_in, hash_ins[1])
            pw.set_target_arr(sc.data.pi_targets, step_pi_values(
                step, p, lay, acc_init_vals, n_accs, n_bskd, n_lwed))
            pw.precompute_sponges(sc.data)
            pws.append(pw)
        return pws

    chains = [[] for _ in range(B)]
    prev = [None] * B
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(make_step_pws, 0)
        for step in range(p.num_steps):
            pws = fut.result()
            if step + 1 < p.num_steps:
                fut = ex.submit(make_step_pws, step + 1)
            tt = TimingTree(f"prove step {step} (batch {B})")
            proofs = prove_batch(sc.data, pws, timing=tt, mesh=mesh)
            tt.done()
            for bi in range(B):
                chains[bi].append(proofs[bi])
                prev[bi] = proofs[bi]

    outs = np.stack([np.asarray(_pis(prev[bi], lay.latest_acc),
                                dtype=np.uint64).reshape(p.K, p.N)
                     for bi in range(B)])
    return jnp.asarray(outs), chains, sc


def make_step_witness(sc: "StepCircuit", step: int, ct, testv, bsk, ksk,
                      natives=None) -> PartialWitness:
    """One step's full PartialWitness for the explicit chain, values from
    the native fastpath chain — lets the dryrun / single-proof sharding
    paths prove a REAL step circuit without driving the whole chain."""
    from .fastpath import compute_chain, step_pi_values
    p = sc.params
    lay = sc.layout
    ct = np.asarray(ct, dtype=np.uint64)
    if natives is None:
        natives = compute_chain(ct, testv, bsk, ksk, p)
    n_accs, n_bskd, n_lwed = natives
    acc_init_vals = np.concatenate(
        [np.zeros((p.K - 1) * p.N, np.uint64), np.asarray(testv)])
    pw = PartialWitness()
    sc.t_acc_init.assign(pw, acc_init_vals.reshape(p.K, p.N))
    pw.set_target(sc.t_counter, step + 1)
    if step == 0:
        ggsw_vals = np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL))
        mask_val = int(ct[p.n])
        hash_ins = (np.zeros(4, np.uint64), np.zeros(4, np.uint64))
    elif step <= p.n:
        ggsw_vals, mask_val = np.asarray(bsk[step - 1]), int(ct[step - 1])
        hash_ins = (np.asarray(n_bskd[step - 1], dtype=np.uint64),
                    np.asarray(n_lwed[step - 1], dtype=np.uint64))
    else:
        ggsw_vals, mask_val = np.asarray(ksk), 0
        hash_ins = (np.asarray(n_bskd[step - 1], dtype=np.uint64),
                    np.asarray(n_lwed[step - 1], dtype=np.uint64))
    sc.t_ggsw.assign(pw, ggsw_vals)
    pw.set_target(sc.t_mask, mask_val)
    sc.t_acc_in.assign(pw, np.asarray(n_accs[step]))
    pw.set_target_arr(sc.t_bsk_hash_in, hash_ins[0])
    pw.set_target_arr(sc.t_lwe_hash_in, hash_ins[1])
    pw.set_target_arr(sc.data.pi_targets, step_pi_values(
        step, p, lay, acc_init_vals, n_accs, n_bskd, n_lwed))
    pw.precompute_sponges(sc.data)
    return pw


def verify_hash_output(hash_data, claimed) -> bool:
    """Native recomputation of an absorb chain h = H(h || block)
    (ref: ivc_based_vpbs.rs:64-78). Uses the C++ host runtime when blocks
    are uniform (the bsk chain is ~n x K^2*N*ELL elements at paper
    params — strictly sequential scalar work)."""
    from .. import runtime
    lens = {len(b) for b in hash_data}
    if runtime.lib is not None and len(lens) == 1:
        # np.stack, NOT a python int() round-trip per element: the bsk
        # chain is 730 x 16,384 u64 at paper shape and the conversion
        # (~12M int() calls, ~30 s) dwarfed the actual C++ hashing
        blocks = np.stack([np.asarray(b, dtype=np.uint64).ravel()
                           for b in hash_data])
        h = runtime.hash_chain(blocks)
        return [int(x) for x in h] == [int(x) for x in claimed]
    h = [0, 0, 0, 0]
    for block in hash_data:
        h = HP.hash_no_pad_host(list(h) + [int(x) for x in block])
    return h == [int(x) for x in claimed]


def verify_pbs(out_ct, ct, testv, bsk, ksk, proofs, sc: StepCircuit) -> None:
    """Verify a chained PBS proof (ref: ivc_based_vpbs.rs:388-489, plus
    the linkage checks the reference does in-circuit)."""
    p = sc.params
    lay = sc.layout
    ct = np.asarray(ct, dtype=np.uint64)
    vk = preprocess(sc.data)["vk"]
    assert len(proofs) == p.num_steps, "wrong number of step proofs"

    tt = TimingTree("verify")
    final = proofs[-1]

    # claimed test vector: zero mask + testv coefficients (ivc:421-431)
    claimed_testv = _pis(final, lay.acc_init)
    assert (claimed_testv[:p.N * (p.K - 1)] == 0).all()
    assert (claimed_testv[p.N * (p.K - 1):] ==
            np.asarray(testv, dtype=np.uint64)).all()
    # counter (ivc:433-436)
    assert int(final.public_inputs[lay.counter]) == p.num_steps
    # claimed output (ivc:438-440)
    assert (np.asarray(out_ct, dtype=np.uint64).reshape(-1) ==
            _pis(final, lay.latest_acc)).all()

    with tt.scope("verifying step proofs"):
        # ONE batched device call verifies the whole chain: transcript
        # replay, PLONK identity and FRI walk for all proofs run as one
        # compiled pipeline (prover/verify_batch). The per-proof scalar
        # verifier cost ~100 ms of GIL-bound Python each — a 730-step
        # chain took minutes; the batch axis takes seconds. Short
        # chains (tests, the multichip dryrun) stay on the scalar
        # verifier: a fresh jit would cost more than it saves.
        if len(proofs) >= BATCH_VERIFY_MIN:
            import os as _os
            from ..prover.verify_batch import verify_batch
            # prefer the accelerator when one is attached: the 730-proof
            # paper chain verifies in 4.2 s on one v5e vs 20.6 s on the
            # 4-core CPU backend (one upload, one executable). Override
            # with VFHE_VERIFY_DEVICE=cpu (e.g. flaky device tunnel).
            dev = None
            if (jax.default_backend() != "cpu"
                    and _os.environ.get("VFHE_VERIFY_DEVICE") != "cpu"):
                dev = jax.devices()[0]
            verify_batch(vk, proofs, device=dev)
        else:
            pis = jnp.asarray(np.stack([np.asarray(pr.public_inputs,
                                                   np.uint64)
                                        for pr in proofs]))
            pi_hashes = np.asarray(HP.hash_no_pad_jit(pis))
            for pr, ph in zip(proofs, pi_hashes):
                verify(vk, pr, pi_hash=ph)

    with tt.scope("verifying chain linkage"):
        for i, proof in enumerate(proofs):
            assert int(proof.public_inputs[lay.counter]) == i + 1
            assert (_pis(proof, lay.acc_init) == claimed_testv).all()
            if i == 0:
                assert (_pis(proof, lay.acc_in) == claimed_testv).all()
                assert (_pis(proof, lay.bsk_hash_in) == 0).all()
                assert (_pis(proof, lay.lwe_hash_in) == 0).all()
            else:
                prev = proofs[i - 1]
                assert (_pis(proof, lay.acc_in) ==
                        _pis(prev, lay.latest_acc)).all()
                assert (_pis(proof, lay.bsk_hash_in) ==
                        _pis(prev, lay.bsk_hash_out)).all()
                assert (_pis(proof, lay.lwe_hash_in) ==
                        _pis(prev, lay.lwe_hash_out)).all()

    # hash chains bind the bsk / ksk and the LWE ciphertext (ivc:459-481)
    bsk_host = np.asarray(bsk)   # ONE device fetch, not n per-row
    #                              round-trips (CLAUDE.md pitfall 5)
    bsk_data = [np.asarray(cggsw.dummy_ct(p.N, p.K, p.ELL)).reshape(-1)]
    lwe_data = [[int(ct[p.n])]]
    for i in range(p.n):
        bsk_data.append(bsk_host[i].reshape(-1))
        lwe_data.append([int(ct[i])])
    bsk_data.append(np.asarray(ksk).reshape(-1))
    lwe_data.append([0])

    # bsk chain assumed precomputable; lwe chain timed (ivc:473-481)
    assert verify_hash_output(bsk_data, _pis(final, lay.bsk_hash_out)), \
        "bsk hash chain mismatch"
    with tt.scope("verifying lwe hash chain"):
        assert verify_hash_output(lwe_data, _pis(final, lay.lwe_hash_out)), \
            "lwe hash chain mismatch"
    tt.done()

    log.info("number of steps: %d", p.num_steps)
    log.info("proof size: %d bytes (x %d steps)",
             proofs[-1].num_bytes(), len(proofs))
