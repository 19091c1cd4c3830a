"""Proof verifier (host-side, plonky2 ``verify()`` equivalent).

Replays the transcript, checks the PLONK identity at zeta in the
quadratic extension, and checks the FRI opening proof query-by-query
(Merkle paths, fold consistency, final-poly evaluation, PoW). This is
the out-of-circuit verifier used by verify_pbs (ref:
ivc_based_vpbs.rs:442-452 "verifying Step 1/2"). Scalar math runs on
python ints (vfhe_tpu.field.host) — orders of magnitude faster than
dispatching per-element device kernels for one point.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as ee
from ..field import host as hf
from ..hashing import poseidon as HP
from . import fri, merkle
from .challenger import Challenger
from .constraints import eval_gate
from .fft import COSET_SHIFT
from .prove import Proof, VerifierKey


class VerificationError(Exception):
    pass


def _mod_sum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Modular sum of canonical values along ``axis`` without per-element
    reduction: 32-bit-split accumulation keeps the u64 sums exact for up
    to 2^32 terms, then one mul folds the high half back."""
    lo = jnp.sum(x & jnp.uint64(0xFFFF_FFFF), axis=axis)
    hi = jnp.sum(x >> jnp.uint64(32), axis=axis)
    return gl.add(gl.mul(lo, jnp.uint64(1)),        # reduce < p
                  gl.mul(hi, jnp.uint64((1 << 32) % gl.P)))


def _g_at_points_impl(p_vals, open_z, open_gz, zeta, gzeta, alpha, xs):
    """G(x) at all query points of one proof in one fused kernel:
    the batched form of ``_g_at_point`` (host-scalar variant kept below
    for reference/debug). p_vals (Q, P) base-field leaf values,
    open_z/open_gz (P, 2), zeta/gzeta/alpha (2,), xs (Q,) -> (Q, 2)."""
    Q, P_ = p_vals.shape

    def step(acc, _):
        return ee.mul(acc, alpha), acc
    _, apows = jax.lax.scan(step, ee.scalar(1), None, length=P_ + 1)

    pe = jnp.stack([p_vals, jnp.zeros_like(p_vals)], axis=-1)  # (Q,P,2)
    tz = ee.mul(apows[None, :P_], ee.sub(pe, open_z[None]))
    tgz = ee.mul(apows[None, :P_], ee.sub(pe, open_gz[None]))
    bz = _mod_sum(tz, axis=1)                                  # (Q, 2)
    bgz = _mod_sum(tgz, axis=1)
    xe = jnp.stack([xs, jnp.zeros_like(xs)], axis=-1)          # (Q, 2)
    return ee.add(ee.mul(bz, ee.inv(ee.sub(xe, zeta))),
                  ee.mul(apows[P_], ee.mul(bgz,
                                           ee.inv(ee.sub(xe, gzeta)))))


_g_at_points_jit = jax.jit(_g_at_points_impl)


def _g_at_points(p_vals, open_z, open_gz, zeta, gzeta, alpha, xs):
    """Run the batched G(x) kernel on the in-process CPU backend (the
    verifier is host-side; a per-proof device dispatch over the TPU
    tunnel would dominate the whole verification)."""
    cpu = jax.devices("cpu")[0]
    # zeta/gzeta/alpha are host-int tuples with components >= 2^63:
    # convert via an explicit uint64 numpy array (a bare np.array() of
    # big python ints silently lands in object/float dtype)
    put = lambda a: jax.device_put(
        jnp.asarray(np.asarray(a, dtype=np.uint64)), cpu)
    return np.asarray(_g_at_points_jit(
        put(p_vals), put(open_z), put(open_gz), put(zeta), put(gzeta),
        put(alpha), put(xs)))


def _ensure(cond: bool, msg: str) -> None:
    if not cond:
        raise VerificationError(msg)


def verify(vk: VerifierKey, proof: Proof, pi_hash=None) -> None:
    """``pi_hash``: optionally precomputed Poseidon hash of the PIs —
    chain verifiers (verify_pbs) hash all proofs' PIs in ONE batched
    call instead of one device dispatch per proof."""
    cfg = vk.config
    h = vk.h
    n_lde = h << cfg.rate_bits
    R = cfg.num_routed_wires
    S = len(vk.gates)
    chunk = cfg.perm_chunk_size
    n_chunks = -(-R // chunk)
    per_ch = 1 + n_chunks

    _ensure(len(proof.public_inputs) == vk.num_pis, "wrong number of PIs")
    if pi_hash is None:
        pi_hash = np.asarray(HP.hash_no_pad_jit(jnp.asarray(
            proof.public_inputs))) if vk.num_pis else np.zeros(4, np.uint64)

    # ---- transcript replay ---------------------------------------------
    ch = Challenger()
    ch.observe(vk.circuit_digest)
    ch.observe(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.sample_array(cfg.num_challenges)
    gammas = ch.sample_array(cfg.num_challenges)
    ch.observe_cap(proof.aux_cap)
    alphas = ch.sample_array(cfg.num_challenges)
    ch.observe_cap(proof.quotient_cap)
    zeta = hf.from_array(ch.sample_ext())
    g = gl.primitive_root_of_unity(h)
    gzeta = hf.mul_base(zeta, g)

    open_pre, open_w, open_aux, open_q = proof.openings
    ch.observe(np.concatenate([o.at_zeta for o in proof.openings]).ravel())
    ch.observe(np.concatenate([o.at_gzeta for o in proof.openings]).ravel())
    fri_alpha = hf.from_array(ch.sample_ext())

    # ---- PLONK identity at zeta ----------------------------------------
    sels = [hf.from_array(open_pre.at_zeta[i]) for i in range(S)]
    sigmas = [hf.from_array(open_pre.at_zeta[S + i]) for i in range(R)]
    consts = [hf.from_array(open_pre.at_zeta[S + R + i])
              for i in range(cfg.num_constants)]
    wires = [hf.from_array(open_w.at_zeta[i])
             for i in range(open_w.at_zeta.shape[0])]
    pi_cols = [hf.ext(int(x)) for x in pi_hash]

    terms = []
    for gi, gate in enumerate(vk.gates):
        cs = eval_gate(gate, hf.HostExtOps, wires, consts, pi_cols)
        terms.extend(hf.mul(sels[gi], c) for c in cs)

    zeta_h = hf.pow_ext(zeta, h)
    zh = hf.sub(zeta_h, hf.ext(1))
    _ensure(zh != hf.ext(0), "zeta landed in H")
    l1 = hf.mul(hf.mul(zh, hf.inv(hf.sub(zeta, hf.ext(1)))),
                hf.ext(gl.h_inv(h % gl.P)))

    for i in range(cfg.num_challenges):
        beta = int(betas[i])
        gamma = int(gammas[i])
        z = hf.from_array(open_aux.at_zeta[i * per_ch])
        z_next = hf.from_array(open_aux.at_gzeta[i * per_ch])
        partials = [hf.from_array(open_aux.at_zeta[i * per_ch + 1 + j])
                    for j in range(n_chunks)]

        ch_terms = list(terms)
        ch_terms.append(hf.mul(l1, hf.sub(z, hf.ext(1))))
        prev = z
        for j in range(n_chunks):
            cols = range(j * chunk, min((j + 1) * chunk, R))
            num_prod = hf.ext(1)
            den_prod = hf.ext(1)
            for c in cols:
                wv = wires[c]
                idc = hf.mul_base(zeta, int(vk.k_cosets[c]))
                nf = hf.add(wv, hf.add(hf.mul_base(idc, beta),
                                       hf.ext(gamma)))
                df = hf.add(wv, hf.add(hf.mul_base(sigmas[c], beta),
                                       hf.ext(gamma)))
                num_prod = hf.mul(num_prod, nf)
                den_prod = hf.mul(den_prod, df)
            ch_terms.append(hf.sub(hf.mul(partials[j], den_prod),
                                   hf.mul(prev, num_prod)))
            prev = partials[j]
        ch_terms.append(hf.sub(z_next, prev))

        alpha = hf.ext(int(alphas[i]))
        acc = hf.ext(0)
        for t in reversed(ch_terms):
            acc = hf.add(hf.mul(acc, alpha), t)

        # t_i(zeta) from the 2^rate_bits quotient chunks of challenge i
        qdf = 1 << cfg.rate_bits
        tq = hf.ext(0)
        for j in reversed(range(qdf)):
            tq = hf.add(hf.mul(tq, zeta_h),
                        hf.from_array(open_q.at_zeta[i * qdf + j]))
        _ensure(acc == hf.mul(zh, tq),
                f"PLONK identity failed for challenge {i}")

    # ---- FRI ------------------------------------------------------------
    fcfg = fri.FriConfig(rate_bits=cfg.rate_bits,
                         arity_bits=cfg.fri_arity_bits,
                         num_queries=cfg.fri_num_queries,
                         pow_bits=cfg.fri_pow_bits,
                         final_poly_len=cfg.fri_final_poly_len)
    sizes, shifts, fbetas = [], [], []
    n = n_lde
    shift = COSET_SHIFT
    for cap in proof.fri_caps:
        ch.observe_cap(cap)
        fbetas.append(np.asarray(ch.sample_ext()))
        sizes.append(n)
        shifts.append(shift)
        n //= 4
        shift = gl.h_pow(shift, 4)
    _ensure(len(proof.fri_final_coeffs) == n >> cfg.rate_bits,
            "final poly / layer size mismatch")
    _ensure(len(proof.fri_final_coeffs) <= cfg.fri_final_poly_len,
            "final poly too large")
    ch.observe(np.asarray(proof.fri_final_coeffs).ravel())
    _ensure(fri.check_pow(ch, proof.pow_witness, fcfg.pow_bits),
            "proof-of-work check failed")
    indices = ch.sample_indices(int(np.log2(n_lde)), fcfg.num_queries)
    _ensure((indices == proof.query_indices).all(), "query indices mismatch")

    caps = [vk.preproc_cap, proof.wires_cap, proof.aux_cap,
            proof.quotient_cap]
    num_polys = vk.num_preproc + len(wires) + \
        open_aux.at_zeta.shape[0] + open_q.at_zeta.shape[0]
    open_z_all = np.concatenate([o.at_zeta for o in proof.openings])
    open_gz_all = np.concatenate([o.at_gzeta for o in proof.openings])

    all_leaves = []
    for qi, (q, qopen) in enumerate(zip(proof.query_indices,
                                        proof.query_openings)):
        q = int(q)
        leaf_all = []
        for oi, (leaf, sibs, cap) in enumerate(zip(qopen.leaves,
                                                   qopen.siblings, caps)):
            _ensure(merkle.verify_path(leaf, q, sibs, cap),
                    f"query {qi}: oracle {oi} merkle path failed")
            leaf_all.append(np.asarray(leaf, dtype=np.uint64))
        p_vals = np.concatenate(leaf_all)
        _ensure(p_vals.size == num_polys, "query leaf width mismatch")
        all_leaves.append(p_vals)

    g_lde = gl.primitive_root_of_unity(n_lde)
    xs = np.array([gl.h_mul(COSET_SHIFT, gl.h_pow(g_lde, int(q)))
                   for q in proof.query_indices], dtype=np.uint64)
    g_vals = _g_at_points(np.stack(all_leaves), open_z_all, open_gz_all,
                          zeta, gzeta, fri_alpha, xs)
    for qi, (q, fround) in enumerate(zip(proof.query_indices,
                                         proof.fri_query_rounds)):
        _ensure(fri.verify_query(fround, proof.fri_caps, int(q),
                                 g_vals[qi], fbetas, sizes, shifts,
                                 proof.fri_final_coeffs, n_lde,
                                 COSET_SHIFT),
                f"query {qi}: FRI fold check failed")


def _g_at_point(p_vals: np.ndarray, x: int, open_z: np.ndarray,
                open_gz: np.ndarray, zeta, gzeta, alpha) -> np.ndarray:
    """G(x) at one LDE point from oracle leaf values (python ints)."""
    bz = hf.ext(0)
    bgz = hf.ext(0)
    apow = hf.ext(1)
    for i in range(p_vals.shape[0]):
        p = int(p_vals[i])
        bz = hf.add(bz, hf.mul(apow,
                               hf.sub(hf.ext(p), hf.from_array(open_z[i]))))
        bgz = hf.add(bgz, hf.mul(apow, hf.sub(hf.ext(p),
                                              hf.from_array(open_gz[i]))))
        apow = hf.mul(apow, alpha)
    xe = hf.ext(x)
    g = hf.add(hf.mul(bz, hf.inv(hf.sub(xe, zeta))),
               hf.mul(apow, hf.mul(bgz, hf.inv(hf.sub(xe, gzeta)))))
    return np.array(g, dtype=np.uint64)
