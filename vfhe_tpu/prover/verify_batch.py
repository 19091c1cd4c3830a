"""Batched proof verifier: B same-shape proofs in ONE jitted pipeline.

The scalar verifier (prover/verify.py) costs ~100 ms/proof on the host —
all of it per-proof Python/numpy overhead spread across transcript
permutes, Merkle paths, FRI folds and the PLONK identity.  A 730-step
explicit chain (the reference's headline artifact, ivc_based_vpbs.rs:
388-489 "verifying Step i") therefore took ~70 s single-threaded and the
GIL caps thread scaling on small hosts.  This module re-states the WHOLE
verifier as data-parallel array code over a batch axis: every proof in
the chain replays its transcript, checks its PLONK identity at zeta and
walks its FRI queries simultaneously, in a single compiled executable —
the same design move the batched prover (prover/batch.py) makes for
proving.

Checks are returned as named (B,) boolean families rather than Python
asserts (no data-dependent control flow under jit); the host wrapper
raises VerificationError naming the first failing proof and family.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as ee
from ..field.extension import W as EXT_W
from ..hashing import constants as HC
from ..hashing import poseidon as H
from ..circuit.builder import (ARITH, BASESUM, BASESUM_CANON, POS1, CONST,
                               PI, SELECT, NTTBF, NTTBF_INV, DECOMP,
                               NTTBF4, NTTBF4_INV, DOT, CSEL, ARITH_LANES,
                               SELECT_LANES, NTTBF_LANES, NTTBF4_LANES,
                               CSEL_LANES, NTT_J, NTT_JI)
from .fft import COSET_SHIFT
from .fri import FriConfig, _inv_x_table, _omega_dft_table
from .prove import VerifierKey, _pow_table
from .verify import VerificationError

U64 = jnp.uint64
_EPS32 = (1 << 32) - 1


# ---------------------------------------------------------------------------
# coordinate-pair extension arithmetic
#
# The generic ext-ops gate evaluator (constraints.eval_gate + ExtOps)
# traces one op per scalar operation — the POS1 gate alone expands to
# ~170k HLO equations, which neither traces nor compiles in reasonable
# time.  Here extension values are (u, v) PAIRS of batched base-field
# arrays: everything affine-with-base-constants (MDS layers, bit
# recombinations, round constants, twiddle-free butterflies) acts
# COORDINATEWISE and tensorizes over lanes/rounds, and only genuine
# ext x ext products pay the 4-base-mul cost.
# ---------------------------------------------------------------------------

def _eadd(a, b):
    return (gl.add(a[0], b[0]), gl.add(a[1], b[1]))


def _esub(a, b):
    return (gl.sub(a[0], b[0]), gl.sub(a[1], b[1]))


def _emul(a, b):
    u = gl.add(gl.mul(a[0], b[0]),
               gl.mul(jnp.uint64(EXT_W), gl.mul(a[1], b[1])))
    v = gl.add(gl.mul(a[0], b[1]), gl.mul(a[1], b[0]))
    return (u, v)


def _emul_base(a, c):
    """ext * base-field array (coordinatewise)."""
    return (gl.mul(a[0], c), gl.mul(a[1], c))


def _emuli(a, c: int):
    cc = jnp.uint64(c % gl.P)
    return (gl.mul(a[0], cc), gl.mul(a[1], cc))


def _eaddi(a, c: int):
    return (gl.add(a[0], jnp.uint64(c % gl.P)), a[1])


def _esq7(a):
    """ext x^7 (the Poseidon sbox)."""
    a2 = _emul(a, a)
    a4 = _emul(a2, a2)
    return _emul(_emul(a4, a2), a)


def _pack(pairs):
    """[(u, v)] rows (each (k, B)) -> (B, T, 2) stacked ext tensor."""
    u = jnp.concatenate([p[0] for p in pairs], axis=0)
    v = jnp.concatenate([p[1] for p in pairs], axis=0)
    return jnp.stack([u, v], axis=-1).transpose(1, 0, 2)


def _bitsum_rows(bits_u, bits_v, weights):
    """Modular weighted row-sum with base weights: (nb, ...) x (nb,) ->
    (...,) per coordinate (exact via 32-bit split accumulation)."""
    w = jnp.asarray(np.asarray(weights, dtype=np.uint64))
    shape = (-1,) + (1,) * (bits_u.ndim - 1)
    wu = gl.mul(bits_u, w.reshape(shape))
    wv = gl.mul(bits_v, w.reshape(shape))
    return _mod_sum(wu, 0), _mod_sum(wv, 0)


def _dot_rows_pair(mat: np.ndarray, cols):
    """(R, K) base constant matrix @ (K, ...) ext columns -> (R, ...)."""
    m = jnp.asarray(np.asarray(mat, dtype=np.uint64))
    pu = gl.mul(m[..., None], cols[0][None])       # (R, K, ...)
    pv = gl.mul(m[..., None], cols[1][None])
    return _mod_sum(pu, 1), _mod_sum(pv, 1)


def _eval_gates_ext(gates, wires, consts, pi_hash):
    """All gates' constraints at zeta over a batch: wires/consts are
    (u, v) pairs of (n_cols, B) arrays, pi_hash is (B, 4) base.

    Produces the constraints of constraints.eval_gate in the SAME order
    (pinned by tests/test_verify_batch.test_ext_eval_matches_host), but
    tensorized over lanes/rounds/bits so the traced graph stays small.
    Returns (B, T, 2) plus the per-gate constraint counts.
    """
    wu, wv = wires
    cu, cv = consts
    rows = []            # [(u, v)] each (k, B)
    counts = []

    def w_at(idx):
        idx = np.asarray(idx)
        return (wu[idx], wv[idx])

    for gate in gates:
        kind = gate.kind
        before = len(rows)
        if kind == ARITH:
            idx = np.arange(ARITH_LANES) * 4
            a, b, c, out = (w_at(idx + i) for i in range(4))
            k0 = (cu[0][None], cv[0][None])
            k1 = (cu[1][None], cv[1][None])
            val = _eadd(_emul(k0, _emul(a, b)), _emul(k1, c))
            rows.append(_esub(val, out))
        elif kind == BASESUM:
            nb = gate.param
            for lane in range(gate.lanes):
                base = lane * (1 + nb)
                s = w_at([base])
                bits = w_at(base + 1 + np.arange(nb))
                rows.append(_esub(_emul(bits, bits), bits))   # b^2 - b
                acc = _bitsum_rows(bits[0], bits[1],
                                   [pow(2, i, gl.P) for i in range(nb)])
                rows.append(_esub((acc[0][None], acc[1][None]), s))
        elif kind == BASESUM_CANON:
            nb = gate.param
            for lane in range(gate.lanes):
                base = lane * (nb + 5)
                s = w_at([base])
                bits = w_at(base + 1 + np.arange(nb))
                lo, hi, u_, t1 = (w_at([base + 1 + nb + k])
                                  for k in range(4))
                boo = _esub(_emul(bits, bits), bits)
                if nb > 64:   # bits past 63 pinned to zero
                    boo = (boo[0].at[64:].set(bits[0][64:]),
                           boo[1].at[64:].set(bits[1][64:]))
                rows.append(boo)
                acc = _bitsum_rows(bits[0], bits[1],
                                   [pow(2, i, gl.P) for i in range(nb)])
                lo_acc = _bitsum_rows(bits[0][:32], bits[1][:32],
                                      [1 << i for i in range(32)])
                hi_acc = _bitsum_rows(bits[0][32:64], bits[1][32:64],
                                      [1 << i for i in range(32)])
                one_row = (jnp.ones_like(t1[0]), jnp.zeros_like(t1[1]))
                rows.append(_esub((acc[0][None], acc[1][None]), s))
                rows.append(_esub((lo_acc[0][None], lo_acc[1][None]), lo))
                rows.append(_esub((hi_acc[0][None], hi_acc[1][None]), hi))
                rows.append(_esub(_emul(_eaddi(hi, gl.P - _EPS32), u_),
                                  t1))
                rows.append(_emul(lo, _esub(t1, one_row)))
        elif kind == DECOMP:
            nb, logb = gate.param >> 8, gate.param & 0xFF
            nl = nb // logb
            x = w_at([0])
            bal = w_at(1 + np.arange(nl))
            bits = w_at(1 + nl + np.arange(nb))
            lo, hi, u_, t1 = (w_at([1 + nl + nb + k]) for k in range(4))
            boo = _esub(_emul(bits, bits), bits)
            if nb > 64:
                boo = (boo[0].at[64:].set(bits[0][64:]),
                       boo[1].at[64:].set(bits[1][64:]))
            rows.append(boo)
            acc = _bitsum_rows(bits[0], bits[1],
                               [pow(2, i, gl.P) for i in range(nb)])
            lo_acc = _bitsum_rows(bits[0][:32], bits[1][:32],
                                  [1 << i for i in range(32)])
            hi_acc = _bitsum_rows(bits[0][32:64], bits[1][32:64],
                                  [1 << i for i in range(32)])
            one_row = (jnp.ones_like(t1[0]), jnp.zeros_like(t1[1]))
            rows.append(_esub((acc[0][None], acc[1][None]), x))
            rows.append(_esub((lo_acc[0][None], lo_acc[1][None]), lo))
            rows.append(_esub((hi_acc[0][None], hi_acc[1][None]), hi))
            rows.append(_esub(_emul(_eaddi(hi, gl.P - _EPS32), u_), t1))
            rows.append(_emul(lo, _esub(t1, one_row)))
            # balanced-limb rows: lacc_i = sum_j 2^j b_{i*logb+j}
            #   + b_{i*logb-1} (i>0) - 2^logb * b_{(i+1)*logb-1} - bal_i
            limb_w = np.zeros((nl, nb), dtype=np.uint64)
            for i in range(nl):
                for j in range(logb):
                    limb_w[i, i * logb + j] = 1 << j
                if i:
                    limb_w[i, i * logb - 1] = \
                        gl.h_add(limb_w[i, i * logb - 1], 1)
                limb_w[i, (i + 1) * logb - 1] = gl.h_add(
                    int(limb_w[i, (i + 1) * logb - 1]),
                    gl.P - (1 << logb))
            lacc = _dot_rows_pair(limb_w, bits)
            rows.append(_esub(lacc, bal))
        elif kind in (NTTBF, NTTBF_INV):
            idx = np.arange(NTTBF_LANES) * 4
            u_w, v_w, o1, o2 = (w_at(idx + i) for i in range(4))
            c = (cu[0:NTTBF_LANES], cv[0:NTTBF_LANES])
            if kind == NTTBF:
                s = _emul(c, v_w)
                c1 = _esub(_eadd(u_w, s), o1)
                c2 = _esub(_esub(u_w, s), o2)
            else:
                c1 = _esub(_eadd(u_w, v_w), o1)
                c2 = _esub(_emul(c, _esub(u_w, v_w)), o2)
            # interleave per lane (c1, c2) to match eval_gate order
            rows.append((jnp.stack([c1[0], c2[0]], 1).reshape(
                             2 * NTTBF_LANES, -1),
                         jnp.stack([c1[1], c2[1]], 1).reshape(
                             2 * NTTBF_LANES, -1)))
        elif kind in (NTTBF4, NTTBF4_INV):
            idx = np.arange(NTTBF4_LANES) * 8
            A, Bw, C, D, o0, o1, o2, o3 = (w_at(idx + i)
                                           for i in range(8))
            c = (cu[0:NTTBF4_LANES], cv[0:NTTBF4_LANES])
            c2 = _emul(c, c)
            if kind == NTTBF4:
                t1 = _emul(c2, C)
                t2 = _emul(c, Bw)
                t3 = _emul(_emul(c2, c), D)
                x1, y1 = _eadd(A, t1), _eadd(t2, t3)
                k0 = _esub(_eadd(x1, y1), o0)
                k1 = _esub(_esub(x1, y1), o1)
                xm = _esub(A, t1)
                ym = _emuli(_esub(t2, t3), NTT_J)
                k2 = _esub(_eadd(xm, ym), o2)
                k3 = _esub(_esub(xm, ym), o3)
            else:
                u1, d1 = _eadd(A, Bw), _esub(A, Bw)
                u2, d2 = _eadd(C, D), _esub(C, D)
                jd2 = _emuli(d2, NTT_JI)
                k0 = _esub(_eadd(u1, u2), o0)
                k1 = _esub(_emul(c, _eadd(d1, jd2)), o1)
                k2 = _esub(_emul(c2, _esub(u1, u2)), o2)
                k3 = _esub(_emul(_emul(c2, c), _esub(d1, jd2)), o3)
            rows.append((jnp.stack([k0[0], k1[0], k2[0], k3[0]],
                                   1).reshape(4 * NTTBF4_LANES, -1),
                         jnp.stack([k0[1], k1[1], k2[1], k3[1]],
                                   1).reshape(4 * NTTBF4_LANES, -1)))
        elif kind == DOT:
            msk, J = gate.param >> 8, gate.param & 0xFF
            lanes = gate.lanes
            idx = np.arange(lanes) * (2 * J + 2)
            acc = w_at(idx + 2 * J)
            for j in range(J):
                prod = _emul(w_at(idx + 2 * j), w_at(idx + 2 * j + 1))
                acc = _esub(acc, prod) if (msk >> j) & 1 \
                    else _eadd(acc, prod)
            rows.append(_esub(acc, w_at(idx + 2 * J + 1)))
        elif kind == CSEL:
            bit = w_at([0])
            idx = 1 + np.arange(CSEL_LANES) * 3
            x, y, out = (w_at(idx + i) for i in range(3))
            if gate.param:
                x = _emuli(x, gl.P - 1)
            rows.append(_esub(_eadd(_emul(bit, _esub(x, y)), y), out))
        elif kind == SELECT:
            idx = np.arange(SELECT_LANES) * 4
            b, x, y, out = (w_at(idx + i) for i in range(4))
            rows.append(_esub(_eadd(_emul(b, _esub(x, y)), y), out))
        elif kind == POS1:
            rows.extend(_pos1_ext((wu, wv)))
        elif kind == CONST:
            rows.append(_esub(w_at(np.arange(4)),
                              (cu[0:4], cv[0:4])))
        elif kind == PI:
            ph = jnp.transpose(pi_hash)                  # (4, B)
            rows.append(_esub(w_at(np.arange(4)),
                              (ph, jnp.zeros_like(ph))))
        else:
            raise ValueError(kind)
        counts.append(sum(r[0].shape[0] for r in rows[before:]))
    return _pack(rows), counts


def _pos1_ext(wires):
    """POS1 constraints over ext coordinate pairs, tensorized the same
    way as constraints._pos1_stacked (which see); MDS layers and the
    partial-round affine folds are base-linear, so they run
    coordinatewise; only the sboxes pay ext-mul cost."""
    wu, wv = wires
    rc = HC.all_round_constants()
    mds = np.asarray(HC.mds_matrix(), dtype=np.uint64)
    a0, b0, c0, A26, B26, c26 = HC.pos1_affine_data()
    rows = []
    s4 = (wu[60:72], wv[60:72])
    sb = (wu[72:94], wv[72:94])

    def full_round(state, k):
        stu = gl.add(state[0],
                     jnp.asarray(np.asarray(rc[k], np.uint64))[:, None])
        out = _esq7((stu, state[1]))
        return _dot_rows_pair(mds, out)

    state = (wu[0:12], wv[0:12])
    for k in range(HC.HALF_FULL_ROUNDS):
        out = full_round(state, k)
        nxt = (wu[24 + 12 * k:36 + 12 * k], wv[24 + 12 * k:36 + 12 * k])
        rows.append(_esub(out, nxt))
        state = nxt

    y0 = _eadd(_eadd(_dot_rows_pair(a0, s4), _dot_rows_pair(b0, sb)),
               (jnp.asarray(np.asarray(c0, np.uint64))[:, None],
                jnp.zeros((22, 1), U64)))
    rows.append(_esub(_esq7(y0), sb))

    x26 = _eadd(_eadd(_dot_rows_pair(A26, s4), _dot_rows_pair(B26, sb)),
                (jnp.asarray(np.asarray(c26, np.uint64))[:, None],
                 jnp.zeros((12, 1), U64)))
    state = x26
    targets = [(wu[94:106], wv[94:106]), (wu[106:118], wv[106:118]),
               (wu[118:130], wv[118:130]), (wu[12:24], wv[12:24])]
    for k in range(4):
        out = full_round(state, 26 + k)
        rows.append(_esub(out, targets[k]))
        state = targets[k]
    return rows


def _ext_of(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([b, jnp.zeros_like(b)], axis=-1)


def _ext_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a == b).all(axis=-1)


class _Sponge:
    """Trace-time batched duplex challenger on (B, 12) states.

    Mirrors prover/challenger.Challenger exactly (same absorb chunking,
    same squeeze order), with every state a (B,)-batched array: one
    permute advances all B transcripts."""

    def __init__(self, batch: int):
        self.B = batch
        self.state = jnp.zeros((batch, HC.WIDTH), U64)
        self.pending: list[jnp.ndarray] = []
        self.navail = 0

    def observe(self, arr) -> None:
        arr = jnp.asarray(arr, U64)
        if arr.ndim == 1:          # shared constant: same for every proof
            arr = jnp.broadcast_to(arr[None], (self.B, arr.shape[0]))
        else:
            arr = arr.reshape(self.B, -1)
        self.pending.append(arr)
        self.navail = 0

    def _duplex(self) -> None:
        if self.pending:
            m = jnp.concatenate(self.pending, axis=-1)
            self.pending = []
            full, rem = divmod(m.shape[-1], HC.RATE)
            st = self.state
            if full:
                chunks = jnp.moveaxis(
                    m[..., :full * HC.RATE].reshape(self.B, full, HC.RATE),
                    1, 0)

                def body(s, c):
                    s = jnp.concatenate([c, s[..., HC.RATE:]], axis=-1)
                    return H.permute_fast(s), None

                st, _ = jax.lax.scan(body, st, chunks)
            if rem:
                st = H.permute_fast(jnp.concatenate(
                    [m[..., full * HC.RATE:], st[..., rem:]], axis=-1))
            self.state = st
        else:
            self.state = H.permute_fast(self.state)
        self.navail = HC.RATE

    def sample(self) -> jnp.ndarray:
        if self.navail == 0:
            self._duplex()
        out = self.state[..., HC.RATE - self.navail]
        self.navail -= 1
        return out

    def sample_ext(self) -> jnp.ndarray:
        a = self.sample()
        return jnp.stack([a, self.sample()], axis=-1)


def _mod_sum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact modular sum of canonical u64s via 32-bit-split accumulation
    (same trick as verify._mod_sum)."""
    lo = jnp.sum(x & jnp.uint64(0xFFFF_FFFF), axis=axis)
    hi = jnp.sum(x >> jnp.uint64(32), axis=axis)
    return gl.add(gl.mul(lo, jnp.uint64(1)),
                  gl.mul(hi, jnp.uint64((1 << 32) % gl.P)))


def _path_fold(digest: jnp.ndarray, sibs: jnp.ndarray,
               idx: jnp.ndarray):
    """Fold (..., 4) leaf digests up a (..., D, 4) sibling stack;
    returns (root digest under the cap, cap index)."""
    def body(carry, sib):
        dig, ii = carry
        bit = (ii & 1).astype(bool)
        left = jnp.where(bit[..., None], sib, dig)
        right = jnp.where(bit[..., None], dig, sib)
        return (H.two_to_one(left, right), ii >> 1), None

    (dig, ii), _ = jax.lax.scan(body, (digest, idx),
                                jnp.moveaxis(sibs, -2, 0))
    return dig, ii


def _cap_lookup(cap: jnp.ndarray, ii: jnp.ndarray) -> jnp.ndarray:
    """cap (B, C, 4) or (C, 4); ii (B, Q) -> (B, Q, 4)."""
    if cap.ndim == 2:
        return cap[ii]
    take = jax.vmap(lambda c, i: c[i])      # over B
    return take(cap, ii)


def _make_verifier(vk: VerifierKey, batch: int):
    """Build the jitted B-proof verifier for this vk (compiled once per
    (circuit, B) pair on the in-process CPU backend)."""
    cfg = vk.config
    h = vk.h
    n_lde = h << cfg.rate_bits
    R = cfg.num_routed_wires
    S = len(vk.gates)
    chunk = cfg.perm_chunk_size
    n_chunks = -(-R // chunk)
    per_ch = 1 + n_chunks
    Q = cfg.fri_num_queries
    qdf = 1 << cfg.rate_bits

    # static FRI layer schedule (mirrors verify()'s sizes/shifts loop)
    sizes, shifts = [], []
    n = n_lde
    shift = COSET_SHIFT
    while n > (cfg.fri_final_poly_len << cfg.rate_bits):
        sizes.append(n)
        shifts.append(shift)
        n //= 4
        shift = gl.h_pow(shift, 4)
    n_final, shift_final = n, shift
    final_len = n_final >> cfg.rate_bits

    # static host tables (small: <=n_lde u64 entries)
    xs_table = gl.mul(jnp.asarray(
        _pow_table(gl.primitive_root_of_unity(n_lde), n_lde)),
        jnp.uint64(COSET_SHIFT))
    invx_tables = [np.asarray(_inv_x_table(nl, sl)[:nl // 4])
                   for nl, sl in zip(sizes, shifts)]
    dfts = [np.asarray(_omega_dft_table(nl, 4)) for nl in sizes]
    gfinal_table = _pow_table(gl.primitive_root_of_unity(n_final), n_final)
    xfinal_table = gl.mul(jnp.asarray(gfinal_table),
                          jnp.uint64(shift_final % gl.P))
    circuit_digest = np.asarray(vk.circuit_digest, np.uint64)
    preproc_cap = np.asarray(vk.preproc_cap, np.uint64)
    k_cosets = [int(x) for x in vk.k_cosets]

    def run(pis, wires_cap, aux_cap, quotient_cap, open_z, open_gz,
            fri_caps, final_coeffs, pow_witness, qidx,
            leaves, oracle_sibs, fri_leaves, fri_sibs):
        B = batch
        checks = {}
        pi_hash = H.hash_no_pad(pis) if pis.shape[-1] else \
            jnp.zeros((B, 4), U64)

        # ---- transcript replay ----------------------------------------
        ch = _Sponge(B)
        ch.observe(jnp.asarray(circuit_digest))
        ch.observe(pi_hash)
        ch.observe(wires_cap)
        betas = [ch.sample() for _ in range(cfg.num_challenges)]
        gammas = [ch.sample() for _ in range(cfg.num_challenges)]
        ch.observe(aux_cap)
        alphas = [ch.sample() for _ in range(cfg.num_challenges)]
        ch.observe(quotient_cap)
        zeta = ch.sample_ext()                               # (B, 2)
        g = jnp.uint64(gl.primitive_root_of_unity(h))
        gzeta = ee.mul_base(zeta, jnp.broadcast_to(g, zeta.shape[:-1]))

        ch.observe(open_z)
        ch.observe(open_gz)
        fri_alpha = ch.sample_ext()

        # ---- PLONK identity at zeta -----------------------------------
        n_pre = vk.num_preproc
        n_wires = cfg.num_wires
        w_off = n_pre
        a_off = w_off + n_wires
        q_off = a_off + per_ch * cfg.num_challenges

        oz = open_z.transpose(1, 0, 2)                # (P, B, 2)
        sels = (oz[:S, :, 0], oz[:S, :, 1])           # (S, B) coord pairs
        sig = (oz[S:S + R, :, 0], oz[S:S + R, :, 1])
        consts_p = (oz[S + R:S + R + cfg.num_constants, :, 0],
                    oz[S + R:S + R + cfg.num_constants, :, 1])
        wires_p = (oz[w_off:w_off + n_wires, :, 0],
                   oz[w_off:w_off + n_wires, :, 1])

        cs_all, counts = _eval_gates_ext(vk.gates, wires_p, consts_p,
                                         pi_hash)                # (B,T,2)
        rep = np.repeat(np.arange(S), counts)
        sel_t = jnp.stack([sels[0][rep], sels[1][rep]],
                          axis=-1).transpose(1, 0, 2)            # (B,T,2)
        terms_t = ee.mul(sel_t, cs_all)

        zeta_h = ee.pow_const(zeta, h)
        one = jnp.zeros((B, 2), U64).at[..., 0].set(jnp.uint64(1))
        zh = ee.sub(zeta_h, one)
        checks["zeta not in H"] = ~_ext_eq(zh, jnp.zeros_like(zh))
        l1 = ee.mul(ee.mul(zh, ee.inv(ee.sub(zeta, one))),
                    jnp.broadcast_to(
                        jnp.asarray([gl.h_inv(h % gl.P), 0], np.uint64),
                        (B, 2)))

        wires_r = (wires_p[0][:R], wires_p[1][:R])    # (R, B)
        kc = jnp.asarray(np.asarray(k_cosets[:R], np.uint64))
        padR = n_chunks * chunk
        plonk_ok = jnp.ones((B,), bool)
        for i in range(cfg.num_challenges):
            beta, gamma, alpha = betas[i], gammas[i], alphas[i]
            z = open_z[:, a_off + i * per_ch]                    # (B,2)
            z_next = open_gz[:, a_off + i * per_ch]
            partials = open_z[:, a_off + i * per_ch + 1:
                              a_off + i * per_ch + 1 + n_chunks]

            # numerator/denominator factors for ALL routed columns at
            # once; chunk products via `chunk` tensorized ext muls
            idc = (gl.mul(kc[:, None], zeta[None, :, 0]),
                   gl.mul(kc[:, None], zeta[None, :, 1]))        # (R,B)
            nf = _eadd(wires_r, _emul_base(idc, beta[None]))
            nf = (gl.add(nf[0], gamma[None]), nf[1])
            df = _eadd(wires_r, _emul_base(sig, beta[None]))
            df = (gl.add(df[0], gamma[None]), df[1])

            def chunk_prod(p):
                pu = jnp.concatenate(
                    [p[0], jnp.ones((padR - R, B), U64)], axis=0)
                pv = jnp.concatenate(
                    [p[1], jnp.zeros((padR - R, B), U64)], axis=0)
                pu = pu.reshape(n_chunks, chunk, B)
                pv = pv.reshape(n_chunks, chunk, B)
                acc = (pu[:, 0], pv[:, 0])
                for jj in range(1, chunk):
                    acc = _emul(acc, (pu[:, jj], pv[:, jj]))
                return acc                                       # (nc,B)
            num_p = chunk_prod(nf)
            den_p = chunk_prod(df)

            parts = (partials[..., 0].transpose(1, 0),
                     partials[..., 1].transpose(1, 0))           # (nc,B)
            prevs = (jnp.concatenate([z[None, :, 0],
                                      parts[0][:-1]], axis=0),
                     jnp.concatenate([z[None, :, 1],
                                      parts[1][:-1]], axis=0))
            chunk_terms = _esub(_emul(parts, den_p),
                                _emul(prevs, num_p))             # (nc,B)

            last_part = jnp.stack([parts[0][-1], parts[1][-1]], axis=-1)
            tail = [ee.mul(l1, ee.sub(z, one))[:, None],         # (B,1,2)
                    jnp.stack(chunk_terms, -1).transpose(1, 0, 2),
                    ee.sub(z_next, last_part)[:, None]]
            allt = jnp.concatenate([terms_t] + tail, axis=1)
            xs = jnp.flip(allt.transpose(1, 0, 2), axis=0)

            def horner(acc, t):
                return ee.add(ee.mul_base(acc, alpha), t), None
            acc, _ = jax.lax.scan(horner, jnp.zeros((B, 2), U64), xs)

            tq = jnp.zeros((B, 2), U64)
            for j in reversed(range(qdf)):
                tq = ee.add(ee.mul(tq, zeta_h),
                            open_z[:, q_off + i * qdf + j])
            plonk_ok &= _ext_eq(acc, ee.mul(zh, tq))
        checks["PLONK identity"] = plonk_ok

        # ---- FRI -------------------------------------------------------
        fri_betas = []
        for li in range(len(sizes)):
            ch.observe(fri_caps[:, li])
            fri_betas.append(ch.sample_ext())
        ch.observe(final_coeffs)
        ch.observe(pow_witness[:, None])
        checks["proof of work"] = \
            ch.sample() < jnp.uint64(1 << (64 - cfg.fri_pow_bits))
        mask = jnp.uint64(n_lde - 1)
        sampled = jnp.stack([ch.sample() & mask for _ in range(Q)],
                            axis=-1)
        checks["query indices"] = (sampled ==
                                   qidx.astype(U64)).all(axis=-1)

        # ---- main-oracle Merkle paths ---------------------------------
        q0 = qidx.astype(jnp.int32)                       # (B, Q)
        caps_per_oracle = [jnp.asarray(preproc_cap), wires_cap, aux_cap,
                           quotient_cap]
        path_ok = jnp.ones((B, Q), bool)
        for oi, leaf in enumerate(leaves):
            dig = H.hash_no_pad(leaf)                     # (B, Q, 4)
            dig, ii = _path_fold(dig, oracle_sibs[oi], q0)
            path_ok &= (dig == _cap_lookup(caps_per_oracle[oi], ii)) \
                .all(axis=-1)
        checks["oracle merkle paths"] = path_ok.all(axis=-1)

        # ---- G(x) from the oracle leaves ------------------------------
        p_vals = jnp.concatenate(leaves, axis=-1)         # (B, Q, P)
        P_ = p_vals.shape[-1]

        def apow_step(acc, _):
            return ee.mul(acc, fri_alpha), acc
        _, apows = jax.lax.scan(
            apow_step, jnp.broadcast_to(one, (B, 2)), None, length=P_ + 1)
        apows = jnp.moveaxis(apows, 0, 1)                 # (B, P+1, 2)

        pe = _ext_of(p_vals)                              # (B, Q, P, 2)
        tz = ee.mul(apows[:, None, :P_], ee.sub(pe, open_z[:, None]))
        tgz = ee.mul(apows[:, None, :P_], ee.sub(pe, open_gz[:, None]))
        bz = _mod_sum(tz, axis=2)                         # (B, Q, 2)
        bgz = _mod_sum(tgz, axis=2)
        xe = _ext_of(xs_table[q0])                        # (B, Q, 2)
        value = ee.add(
            ee.mul(bz, ee.inv(ee.sub(xe, zeta[:, None]))),
            ee.mul(apows[:, None, P_],
                   ee.mul(bgz, ee.inv(ee.sub(xe, gzeta[:, None])))))

        # ---- FRI fold checks ------------------------------------------
        fold_ok = jnp.ones((B, Q), bool)
        qi = q0
        for li, (nl, _sl) in enumerate(zip(sizes, shifts)):
            m = nl // 4
            r = qi % m
            t = qi // m
            leaf4 = fri_leaves[li]                        # (B, Q, 4, 2)
            dig = H.hash_no_pad(leaf4.reshape(B, Q, 8))
            dig, ii = _path_fold(dig, fri_sibs[li], r)
            fold_ok &= (dig == _cap_lookup(fri_caps[:, li], ii)) \
                .all(axis=-1)
            opened = jnp.take_along_axis(
                leaf4, t[..., None, None].astype(jnp.int32), axis=2
            )[:, :, 0]                                    # (B, Q, 2)
            fold_ok &= _ext_eq(opened, value)
            # arity-4 fold at the queried coset (batched _fold_point)
            dft = dfts[li]
            ws = []
            for j in range(4):
                acc = None
                for tt in range(4):
                    term = ee.mul_base(
                        leaf4[:, :, tt],
                        jnp.broadcast_to(jnp.uint64(dft[j, tt]), (B, Q)))
                    acc = term if acc is None else ee.add(acc, term)
                ws.append(acc)
            x_inv = jnp.asarray(invx_tables[li])[r]       # (B, Q)
            bx = ee.mul_base(
                jnp.broadcast_to(fri_betas[li][:, None], (B, Q, 2)), x_inv)
            acc = ws[3]
            for j in (2, 1, 0):
                acc = ee.add(ee.mul(acc, bx), ws[j])
            value = ee.mul_base(
                acc, jnp.broadcast_to(jnp.uint64(gl.h_inv(4)), (B, Q)))
            qi = r
        checks["fri folds"] = fold_ok.all(axis=-1)

        # ---- final polynomial -----------------------------------------
        x = xfinal_table[qi]                              # (B, Q)
        acc = jnp.zeros((B, Q, 2), U64)
        for j in reversed(range(final_len)):
            acc = ee.add(ee.mul_base(acc, x), final_coeffs[:, None, j])
        checks["fri final poly"] = _ext_eq(acc, value).all(axis=-1)
        return checks

    return jax.jit(run), (sizes, final_len)


@functools.lru_cache(maxsize=8)
def _verifier_cache(vk_key, batch):
    vk = _verifier_cache._vks[vk_key]
    return _make_verifier(vk, batch)


_verifier_cache._vks = {}


# ---------------------------------------------------------------------------
# AOT executable cache (kills the verifier's cold start)
#
# jax's persistent compilation cache only skips the XLA compile; TRACING
# the batched verifier (~16 s at paper shape on CPU) is paid once per
# process.  Serializing the compiled PJRT executable itself loads in
# O(file size), so a cold process with a warm cache verifies in well
# under a second (VERDICT round 4 next #5).  Same mechanism + caveats as
# the witness-fn cache (circuit/compile._LazyExportCached): executables
# are machine-specific (key includes platform version + CPU flags), and
# multi-circuit processes disable it via VFHE_WFN_EXE_CACHE=0 (raw-PJRT
# deserialization can clash with already-loaded modules — conftest).
# ---------------------------------------------------------------------------

_VB_SCHEMA = 1
# the jitted verifier returns a dict; its flattened output order is the
# sorted key order, which the raw-executable path must reproduce. The
# compile path asserts this list stays in sync with run()'s checks.
_CHECK_NAMES = ("PLONK identity", "fri final poly", "fri folds",
                "oracle merkle paths", "proof of work", "query indices",
                "zeta not in H")


@functools.lru_cache(maxsize=1)
def _module_src_hash() -> bytes:
    import hashlib
    try:
        with open(__file__, "rb") as f:
            return hashlib.sha256(f.read()).digest()
    except OSError:
        return b"no-source"


def _aot_path(vk: VerifierKey, batch: int, dev) -> str | None:
    """Disk path for this (vk, batch) verifier executable, or None when
    AOT caching does not apply (no cache dir, non-CPU backend, or the
    multi-circuit kill switch)."""
    import hashlib
    import os

    root = jax.config.jax_compilation_cache_dir
    if not root or dev.platform != "cpu":
        return None
    if os.environ.get("VFHE_WFN_EXE_CACHE", "1") == "0":
        return None
    import jaxlib
    import jax.extend as jex
    backend = jex.backend.get_backend("cpu")
    try:
        with open("/proc/cpuinfo") as f:
            cpuflags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        cpuflags = ""
    h = hashlib.sha256()
    h.update(f"vb{_VB_SCHEMA}|{jax.__version__}|{jaxlib.__version__}|"
             f"{batch}|{vk.h}|{vk.num_pis}|{vk.num_preproc}|".encode())
    h.update(backend.platform_version.encode())
    h.update(cpuflags.encode())
    h.update(repr(vk.config).encode())
    h.update(repr([(g.kind, g.param) for g in vk.gates]).encode())
    for a in (vk.k_cosets, vk.preproc_cap, vk.circuit_digest):
        h.update(np.ascontiguousarray(np.asarray(a, np.uint64)).tobytes())
    h.update(np.ascontiguousarray(HC.all_round_constants()).tobytes())
    h.update(_module_src_hash())
    return os.path.join(root, "vbexe", f"cpu-{h.hexdigest()[:32]}.pjrt")


def has_aot_entry(vk: VerifierKey, batch: int) -> bool:
    """True when a serialized verifier executable for (vk, batch) is on
    disk — i.e. verify_batch will skip trace AND compile entirely."""
    import os
    dev = jax.devices("cpu")[0]
    path = _aot_path(vk, batch, dev)
    return path is not None and os.path.exists(path)


_exe_memo: dict = {}


def _run_verifier(runner, args, dev, vk: VerifierKey, batch: int):
    """Execute the batched verifier, preferring the on-disk serialized
    executable; on the first compile, persist it. Falls back to the
    plain jit path on any AOT failure."""
    import logging
    import os

    log = logging.getLogger("vfhe_tpu")
    path = _aot_path(vk, batch, dev)
    if path and os.path.exists(path):
        try:
            import jax.extend as jex
            backend = jex.backend.get_backend("cpu")
            exe = _exe_memo.get(path)
            if exe is None:
                # deserialize is NOT a cheap load: XLA:CPU re-codegens
                # the thunks from the serialized blob every call
                # (measured 1.6-2.4 s for a 12.7 MB executable, repeat
                # calls just as slow) — memoize per process
                with open(path, "rb") as f:
                    exe = backend.deserialize_executable(f.read(), [dev])
                _exe_memo[path] = exe
            flat, _ = jax.tree_util.tree_flatten(args)
            bufs = [jax.device_put(np.asarray(a), dev) for a in flat]
            out = exe.execute_sharded(bufs)
            leaves = [o[0] for o in
                      out.disassemble_into_single_device_arrays()]
            log.info("verifier executable cache hit (batch %d)", batch)
            return jax.device_get(dict(zip(_CHECK_NAMES, leaves)))
        except Exception as e:                              # noqa: BLE001
            log.info("verifier executable cache entry invalid (%s); "
                     "recompiling", e)
            try:
                os.unlink(path)
            except OSError:
                pass
    put = lambda a: jax.device_put(a, dev)                  # noqa: E731
    args_dev = jax.tree_util.tree_map(put, args)
    with jax.default_device(dev):
        if path:
            try:
                import jax.extend as jex
                specs = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                                   np.asarray(a).dtype),
                    args)
                compiled = runner.lower(*specs).compile()
                checks = jax.device_get(compiled(*args_dev))
                assert sorted(checks) == list(_CHECK_NAMES), \
                    "update _CHECK_NAMES to match run()'s check families"
                backend = jex.backend.get_backend("cpu")
                blob = backend.serialize_executable(
                    compiled.runtime_executable())
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
                return checks
            except Exception as e:                          # noqa: BLE001
                log.info("verifier executable cache disabled: %s", e)
        return jax.device_get(runner(*args_dev))


def stack_proofs(proofs):
    """Stage a list of same-shape proofs as stacked numpy arrays."""
    Q = len(proofs[0].query_indices)
    n_oracle = len(proofs[0].query_openings[0].leaves)
    n_layers = len(proofs[0].fri_query_rounds[0].layers)
    arrs = dict(
        pis=np.stack([np.asarray(p.public_inputs, np.uint64)
                      for p in proofs]),
        wires_cap=np.stack([np.asarray(p.wires_cap, np.uint64)
                            for p in proofs]),
        aux_cap=np.stack([np.asarray(p.aux_cap, np.uint64)
                          for p in proofs]),
        quotient_cap=np.stack([np.asarray(p.quotient_cap, np.uint64)
                               for p in proofs]),
        open_z=np.stack([np.concatenate(
            [np.asarray(o.at_zeta, np.uint64) for o in p.openings])
            for p in proofs]),
        open_gz=np.stack([np.concatenate(
            [np.asarray(o.at_gzeta, np.uint64) for o in p.openings])
            for p in proofs]),
        fri_caps=np.stack([np.stack([np.asarray(c, np.uint64)
                                     for c in p.fri_caps])
                           for p in proofs]),
        final_coeffs=np.stack([np.asarray(p.fri_final_coeffs, np.uint64)
                               for p in proofs]),
        pow_witness=np.array([int(p.pow_witness) for p in proofs],
                             np.uint64),
        qidx=np.stack([np.asarray(p.query_indices, np.int64)
                       for p in proofs]),
        leaves=[np.stack([np.stack([
            np.asarray(p.query_openings[q].leaves[oi], np.uint64)
            for q in range(Q)]) for p in proofs])
            for oi in range(n_oracle)],
        oracle_sibs=[np.stack([np.stack([
            np.asarray(p.query_openings[q].siblings[oi], np.uint64)
            for q in range(Q)]) for p in proofs])
            for oi in range(n_oracle)],
        fri_leaves=[np.stack([np.stack([
            np.asarray(p.fri_query_rounds[q].layers[li].leaf, np.uint64)
            for q in range(Q)]) for p in proofs])
            for li in range(n_layers)],
        fri_sibs=[np.stack([np.stack([
            np.asarray(p.fri_query_rounds[q].layers[li].siblings,
                       np.uint64)
            for q in range(Q)]) for p in proofs])
            for li in range(n_layers)],
    )
    return arrs


def verify_batch(vk: VerifierKey, proofs, device=None) -> None:
    """Verify every proof in ``proofs`` (same circuit, same config) in
    one batched device call.  Raises VerificationError naming the first
    failing proof and check family.

    ``device``: None = the in-process CPU backend (the verifier is
    host-side by default); pass a jax device (e.g. the TPU) to run the
    whole pipeline there instead — one upload, one executable.

    Equivalent to calling prover/verify.verify(vk, p) per proof
    (cross-checked by tests/test_verify_batch.py); replaces the
    thread-pool in ivc.vpbs.verify_pbs — threads cannot scale the
    GIL-bound per-proof Python work, a batch axis can.
    """
    if not proofs:
        return
    B = len(proofs)
    for p in proofs:
        if len(p.public_inputs) != vk.num_pis:
            raise VerificationError("wrong number of PIs")
        if len(p.fri_final_coeffs) > vk.config.fri_final_poly_len:
            raise VerificationError("final poly too large")

    vk_key = id(vk)
    _verifier_cache._vks[vk_key] = vk
    runner, (sizes, final_len) = _verifier_cache(vk_key, B)
    if len(proofs[0].fri_query_rounds[0].layers) != len(sizes):
        raise VerificationError("final poly / layer size mismatch")

    arrs = stack_proofs(proofs)
    dev = device if device is not None else jax.devices("cpu")[0]
    args = (arrs["pis"], arrs["wires_cap"], arrs["aux_cap"],
            arrs["quotient_cap"], arrs["open_z"], arrs["open_gz"],
            arrs["fri_caps"], arrs["final_coeffs"], arrs["pow_witness"],
            arrs["qidx"], arrs["leaves"], arrs["oracle_sibs"],
            arrs["fri_leaves"], arrs["fri_sibs"])
    checks = _run_verifier(runner, args, dev, vk, B)
    for name, ok in checks.items():
        if not ok.all():
            bad = int(np.flatnonzero(~ok)[0])
            raise VerificationError(f"proof {bad}: {name} failed")
