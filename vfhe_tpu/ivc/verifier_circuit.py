"""The in-circuit proof verifier — cyclic recursion's engine.

Re-implements prover/verify.py as circuit constraints: Fiat-Shamir
transcript replay (RecursiveChallenger), the PLONK identity at zeta over
extension targets, and the full FRI opening check (batched dynamic-index
Merkle walks, G recombination, per-layer fold consistency, final-poly
evaluation, PoW). The reference gets all of this from plonky2's
``verify_proof`` + ``conditionally_verify_cyclic_proof_or_dummy``
(ivc_based_vpbs.rs:268-273); here *every hard equality is gated on a
``condition`` bool target* — on the IVC base case the prover assigns an
all-zero proof and condition=0, so no dummy-proof machinery is needed.

Vectorization strategy (the witness graph must stay compilable): all 4
main oracles x Q queries walk Merkle levels in lockstep (ONE composite
op), leaf sponges batch per oracle, the alpha-power and constraint-
combination chains are single scanned ops, and gate-constraint
evaluation at zeta stacks the three Poseidon row-kinds into 36-lane
extension ops.
"""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl
from ..field import extension as fe
from ..circuit.builder import (ARITH, BASESUM, BASESUM_CANON, POS1,
                               CONST, PI, SELECT, NTTBF, NTTBF_INV,
                               NTTBF4, NTTBF4_INV, NTTBF4_LANES, NTT_J,
                               NTT_JI, DOT, CSEL, CSEL_LANES,
                               DECOMP, ARITH_LANES, SELECT_LANES,
                               NTTBF_LANES)
from ..hashing import constants as HC
from ..gadgets import extension as ge
from ..prover.fft import COSET_SHIFT
from .proof_target import ProofShape, ProofTarget
from .recursion import RecursiveChallenger

MAX32 = (1 << 32) - 1


def _log2(n: int) -> int:
    return n.bit_length() - 1


# ---------------------------------------------------------------------------
# small vector helpers
# ---------------------------------------------------------------------------

def _tree_sum(b, arr, pairwise) -> np.ndarray:
    """Reduce axis 0 of a target array by pairwise combination."""
    while arr.shape[0] > 1:
        k = arr.shape[0]
        even = arr[0:k - (k % 2):2]
        odd = arr[1:k - (k % 2):2]
        red = pairwise(even, odd)
        if k % 2:
            red = np.concatenate([red, arr[-1:]], axis=0)
        arr = red
    return arr[0]


def base_tree_sum(b, arr) -> np.ndarray:
    """Sum target array over axis 0 (base field)."""
    return _tree_sum(b, arr, lambda x, y: b.add_vec(x, y).reshape(x.shape))


def ext_tree_sum(b, arr) -> np.ndarray:
    """Sum (K, ..., 2) ext targets over axis 0."""
    return _tree_sum(b, arr, lambda x, y: ge.ext_add(b, x, y))


def ext_inverse_cond(b, cond, x) -> np.ndarray:
    """Witnessed extension inverse with the x*inv == 1 pin gated on
    ``cond`` (the base case carries garbage transcripts)."""
    x = np.asarray(x, dtype=np.int64)
    from ..circuit.builder import _WitnessOp
    inv = b.add_virtual_targets(x.size).reshape(x.shape)
    b._defined.update(inv.ravel().tolist())
    b._ops.append(_WitnessOp("ext_inv", dict(x=x.reshape(-1, 2),
                                             out=inv.reshape(-1, 2))))
    prod = ge.ext_mul(b, x, inv)
    one = np.full(prod[..., 0].shape, b.one(), dtype=np.int64)
    b.cond_assert_eq_vec(cond, prod[..., 0], one)
    b.cond_assert_zero_vec(cond, prod[..., 1])
    return inv


def _bit_ladder(b, bits, base_powers, init_const: int) -> np.ndarray:
    """prod = init * PROD_i (bits[:, i] ? base_powers[i] : 1) over base
    targets. bits: (Q, nb); returns (Q,) targets."""
    Q, nb = bits.shape
    cur = np.full(Q, b.constant(init_const), dtype=np.int64)
    for i in range(nb):
        fac = b.select_vec(bits[:, i],
                           np.full(Q, b.constant(int(base_powers[i])),
                                   dtype=np.int64),
                           np.full(Q, b.one(), dtype=np.int64))
        cur = b.mul_vec(cur, fac)
    return cur


def _pow_table(base: int, nb: int) -> list:
    """[base^(2^0), base^(2^1), ...]."""
    out = []
    acc = base % gl.P
    for _ in range(nb):
        out.append(acc)
        acc = gl.h_mul(acc, acc)
    return out


# ---------------------------------------------------------------------------
# gate-constraint evaluation at zeta (extension targets)
# ---------------------------------------------------------------------------

def _eval_pos1(b, wires):
    """Evaluate the POS1 gate's 118 constraints at zeta over extension
    targets, order-matched to constraints.eval_gate: full rounds 0..3,
    partial sboxes j=0..21 (affine folding, pos1_affine_data), full
    rounds 26..29."""
    rc = HC.all_round_constants()
    mds = HC.mds_matrix()
    a0, b0c, c0, A26, B26, c26 = HC.pos1_affine_data()
    s4 = wires[60:72]                            # (12, 2)
    sb = wires[72:94]                            # (22, 2)
    terms = []

    def sbox_all(s):
        x2 = ge.ext_mul(b, s, s)
        x4 = ge.ext_mul(b, x2, x2)
        x6 = ge.ext_mul(b, x4, x2)
        return ge.ext_mul(b, x6, s)

    def full_round(state, r, nxt):
        # dtype matters: python ints >= 2^63 silently become float64
        rc_t = b.constants(np.asarray(rc[r], dtype=np.uint64)).reshape(12)
        s0 = b.add_vec(state[..., 0], rc_t).reshape(12)
        s = np.stack([s0, state[..., 1]], axis=-1)
        x7 = sbox_all(s)
        # MDS: out[i] = sum_j mds[i, j] * x7[j]
        prod = ge.ext_mul_base(
            b, np.broadcast_to(x7[None, :, :], (12, 12, 2)),
            b.constants(mds).reshape(12, 12))
        out = ext_tree_sum(b, np.moveaxis(prod, 1, 0))   # (12, 2)
        return ge.ext_sub(b, out, nxt)

    def aff(mat, cvec):
        # rows of [s4; sb] weighted by the constant matrix, plus cvec
        R = mat.shape[0]
        cols = np.concatenate([s4, sb], axis=0)          # (34, 2)
        prod = ge.ext_mul_base(
            b, np.broadcast_to(cols[None, :, :], (R, 34, 2)),
            b.constants(mat).reshape(R, 34))
        tot = ext_tree_sum(b, np.moveaxis(prod, 1, 0))   # (R, 2)
        c_t = b.constants(np.asarray(cvec, dtype=np.uint64)).reshape(R)
        t0 = b.add_vec(tot[:, 0], c_t).reshape(R)
        return np.stack([t0, tot[:, 1]], axis=-1)

    state = wires[0:12]
    for k in range(HC.HALF_FULL_ROUNDS):
        nxt = wires[24 + 12 * k:36 + 12 * k]
        terms.append(full_round(state, k, nxt))
        state = nxt

    y0 = aff(np.concatenate([a0, b0c], axis=1), c0)      # (22, 2)
    terms.append(ge.ext_sub(b, sbox_all(y0), sb))

    state = aff(np.concatenate([A26, B26], axis=1), c26)  # (12, 2)
    targets = [wires[94:106], wires[106:118], wires[118:130], wires[12:24]]
    for k in range(4):
        terms.append(full_round(state, 26 + k, targets[k]))
        state = targets[k]
    return np.concatenate(terms, axis=0)                  # (118, 2)


def eval_gates_circuit(b, gates, wires, consts, pi_ext):
    """All gates' constraint values at zeta as extension targets.
    Returns (terms (T, 2) target array, gate_index (T,) ints) in the
    exact order of constraints.eval_gate over the ``gates`` list."""
    all_terms = []
    gate_of = []
    for gi, gate in enumerate(gates):
        kind = gate.kind
        if kind == ARITH:
            idx = np.arange(ARITH_LANES) * 4
            a, bb, c, out = (wires[idx + j] for j in range(4))
            ab = ge.ext_mul(b, a, bb)
            k0ab = ge.ext_mul(b, np.broadcast_to(consts[0], ab.shape), ab)
            k1c = ge.ext_mul(b, np.broadcast_to(consts[1], c.shape), c)
            terms = ge.ext_sub(b, ge.ext_add(b, k0ab, k1c), out)
        elif kind == SELECT:
            idx = np.arange(SELECT_LANES) * 4
            bs, x, y, out = (wires[idx + j] for j in range(4))
            val = ge.ext_add(b, ge.ext_mul(b, bs, ge.ext_sub(b, x, y)), y)
            terms = ge.ext_sub(b, val, out)
        elif kind == BASESUM:
            nb = gate.param
            lanes = gate.lanes
            mat = wires[:lanes * (1 + nb)].reshape(lanes, 1 + nb, 2)
            s = mat[:, 0]
            bits = mat[:, 1:]                    # (lanes, nb, 2)
            bools = ge.ext_sub(b, ge.ext_mul(b, bits, bits), bits)
            pows = np.array([pow(2, i, gl.P) for i in range(nb)],
                            dtype=np.uint64)
            weighted = ge.ext_mul_base(
                b, bits, b.constants(np.tile(pows[None], (lanes, 1)))
                .reshape(lanes, nb))
            total = ext_tree_sum(b, np.moveaxis(weighted, 1, 0))
            recomb = ge.ext_sub(b, total, s)[:, None, :]
            terms = np.concatenate([bools, recomb], axis=1).reshape(-1, 2)
        elif kind == BASESUM_CANON:
            nb = gate.param
            lanes = gate.lanes
            mat = wires[:lanes * (nb + 5)].reshape(lanes, nb + 5, 2)
            s = mat[:, 0]
            bits = mat[:, 1:1 + nb]              # (lanes, nb, 2)
            lo, hi, u, t1 = (mat[:, 1 + nb + k] for k in range(4))
            bools = ge.ext_sub(b, ge.ext_mul(b, bits, bits), bits)
            if nb > 64:
                bools = np.concatenate([bools[:, :64], bits[:, 64:]],
                                       axis=1)
            pows = np.array([pow(2, i, gl.P) for i in range(nb)],
                            dtype=np.uint64)
            weighted = ge.ext_mul_base(
                b, bits, b.constants(np.tile(pows[None], (lanes, 1)))
                .reshape(lanes, nb))
            total = ext_tree_sum(b, np.moveaxis(weighted, 1, 0))
            recomb = ge.ext_sub(b, total, s)[:, None, :]
            pows32 = np.array([1 << i for i in range(32)], dtype=np.uint64)
            c32 = b.constants(np.tile(pows32[None], (lanes, 1))) \
                .reshape(lanes, 32)
            lo_sum = ext_tree_sum(b, np.moveaxis(
                ge.ext_mul_base(b, bits[:, :32], c32), 1, 0))
            hi_sum = ext_tree_sum(b, np.moveaxis(
                ge.ext_mul_base(b, bits[:, 32:64], c32), 1, 0))
            lo_c = ge.ext_sub(b, lo_sum, lo)[:, None, :]
            hi_c = ge.ext_sub(b, hi_sum, hi)[:, None, :]
            zt = np.full(lanes, b.zero(), dtype=np.int64)
            eps_ext = np.stack(
                [np.full(lanes, b.constant((1 << 32) - 1), dtype=np.int64),
                 zt], axis=-1)
            one_ext = np.stack(
                [np.full(lanes, b.one(), dtype=np.int64), zt], axis=-1)
            t1row = ge.ext_sub(
                b, ge.ext_mul(b, ge.ext_sub(b, hi, eps_ext), u),
                t1)[:, None, :]
            canon = ge.ext_mul(
                b, lo, ge.ext_sub(b, t1, one_ext))[:, None, :]
            terms = np.concatenate(
                [bools, recomb, lo_c, hi_c, t1row, canon],
                axis=1).reshape(-1, 2)
        elif kind == DECOMP:
            nb = gate.param >> 8
            logb = gate.param & 0xFF
            nl = nb // logb
            x = wires[0]
            bal = wires[1:1 + nl]
            bits = wires[1 + nl:1 + nl + nb]           # (nb, 2)
            lo, hi, u, t1 = (wires[1 + nl + nb + k] for k in range(4))
            bools = ge.ext_sub(b, ge.ext_mul(b, bits, bits), bits)
            if nb > 64:
                bools = np.concatenate([bools[:64], bits[64:]], axis=0)
            pows = np.array([pow(2, i, gl.P) for i in range(nb)],
                            dtype=np.uint64)
            weighted = ge.ext_mul_base(b, bits, b.constants(pows))
            total = ext_tree_sum(b, weighted)
            recomb = ge.ext_sub(b, total, x)[None, :]
            pows32 = np.array([1 << i for i in range(32)], dtype=np.uint64)
            c32 = b.constants(pows32)
            lo_sum = ext_tree_sum(b, ge.ext_mul_base(b, bits[:32], c32))
            hi_sum = ext_tree_sum(b, ge.ext_mul_base(b, bits[32:64], c32))
            lo_c = ge.ext_sub(b, lo_sum, lo)[None, :]
            hi_c = ge.ext_sub(b, hi_sum, hi)[None, :]
            eps_ext = np.array([b.constant((1 << 32) - 1), b.zero()],
                               dtype=np.int64)
            one_ext = np.array([b.one(), b.zero()], dtype=np.int64)
            t1row = ge.ext_sub(
                b, ge.ext_mul(b, ge.ext_sub(b, hi, eps_ext), u),
                t1)[None, :]
            canon = ge.ext_mul(
                b, lo, ge.ext_sub(b, t1, one_ext))[None, :]
            powsl = np.array([1 << j for j in range(logb)],
                             dtype=np.uint64)
            lb = ge.ext_mul_base(
                b, bits[:nl * logb].reshape(nl, logb, 2),
                b.constants(np.tile(powsl[None], (nl, 1)))
                .reshape(nl, logb))
            lsum = ext_tree_sum(b, np.moveaxis(lb, 1, 0))   # (nl, 2)
            # + carry_{i-1} - B*carry_i (top bit of each chunk)
            carry = bits[logb - 1::logb]                    # (nl, 2)
            zero2 = np.array([b.zero(), b.zero()], dtype=np.int64)
            prev_c = np.concatenate([zero2[None], carry[:-1]], axis=0)
            negB = np.full(nl, b.constant(gl.P - (1 << logb)),
                           dtype=np.int64)
            lsum = ge.ext_add(b, ge.ext_add(b, lsum, prev_c),
                              ge.ext_mul_base(b, carry, negB))
            ldiff = ge.ext_sub(b, lsum, bal)
            terms = np.concatenate(
                [bools, recomb, lo_c, hi_c, t1row, canon, ldiff], axis=0)
        elif kind in (NTTBF, NTTBF_INV):
            idx = np.arange(NTTBF_LANES) * 4
            u_w, v_w, o1, o2 = (wires[idx + j] for j in range(4))
            cl = consts[0:NTTBF_LANES]                 # (20, 2)
            if kind == NTTBF:
                s = ge.ext_mul(b, cl, v_w)
                c1 = ge.ext_sub(b, ge.ext_add(b, u_w, s), o1)
                c2 = ge.ext_sub(b, ge.ext_sub(b, u_w, s), o2)
            else:
                c1 = ge.ext_sub(b, ge.ext_add(b, u_w, v_w), o1)
                c2 = ge.ext_sub(
                    b, ge.ext_mul(b, cl, ge.ext_sub(b, u_w, v_w)), o2)
            terms = np.stack([c1, c2], axis=1).reshape(-1, 2)
        elif kind == DOT:
            mask, J = gate.param >> 8, gate.param & 0xFF
            lanes = gate.lanes
            idx = np.arange(lanes) * (2 * J + 2)
            acc = wires[idx + 2 * J]                   # c, (lanes, 2)
            for j in range(J):
                prod = ge.ext_mul(b, wires[idx + 2 * j],
                                  wires[idx + 2 * j + 1])
                acc = ge.ext_sub(b, acc, prod) if (mask >> j) & 1 \
                    else ge.ext_add(b, acc, prod)
            terms = ge.ext_sub(b, acc, wires[idx + 2 * J + 1])
        elif kind == CSEL:
            idx = 1 + np.arange(CSEL_LANES) * 3
            x = wires[idx]
            y = wires[idx + 1]
            out = wires[idx + 2]
            bit = np.broadcast_to(wires[0], x.shape)
            if gate.param:
                # out = y + bit*(-x - y) = y - bit*(x + y)
                val = ge.ext_sub(
                    b, y, ge.ext_mul(b, bit, ge.ext_add(b, x, y)))
            else:
                val = ge.ext_add(
                    b, ge.ext_mul(b, bit, ge.ext_sub(b, x, y)), y)
            terms = ge.ext_sub(b, val, out)
        elif kind in (NTTBF4, NTTBF4_INV):
            # radix-4 lanes: constraint order matched to eval_gate
            idx = np.arange(NTTBF4_LANES) * 8
            A, B, C, D = (wires[idx + j] for j in range(4))
            o0, o1, o2, o3 = (wires[idx + 4 + j] for j in range(4))
            cl = consts[0:NTTBF4_LANES]                # (10, 2)
            c2l = ge.ext_mul(b, cl, cl)
            if kind == NTTBF4:
                t1 = ge.ext_mul(b, c2l, C)
                t2 = ge.ext_mul(b, cl, B)
                t3 = ge.ext_mul(b, ge.ext_mul(b, c2l, cl), D)
                x1 = ge.ext_add(b, A, t1)
                y1 = ge.ext_add(b, t2, t3)
                k0 = ge.ext_sub(b, ge.ext_add(b, x1, y1), o0)
                k1 = ge.ext_sub(b, ge.ext_sub(b, x1, y1), o1)
                xm = ge.ext_sub(b, A, t1)
                jt = np.full(NTTBF4_LANES, b.constant(NTT_J),
                             dtype=np.int64)
                ym = ge.ext_mul_base(b, ge.ext_sub(b, t2, t3), jt)
                k2 = ge.ext_sub(b, ge.ext_add(b, xm, ym), o2)
                k3 = ge.ext_sub(b, ge.ext_sub(b, xm, ym), o3)
            else:
                u1 = ge.ext_add(b, A, B)
                d1 = ge.ext_sub(b, A, B)
                u2 = ge.ext_add(b, C, D)
                d2 = ge.ext_sub(b, C, D)
                jit_ = np.full(NTTBF4_LANES, b.constant(NTT_JI),
                               dtype=np.int64)
                jd2 = ge.ext_mul_base(b, d2, jit_)
                k0 = ge.ext_sub(b, ge.ext_add(b, u1, u2), o0)
                k1 = ge.ext_sub(
                    b, ge.ext_mul(b, cl, ge.ext_add(b, d1, jd2)), o1)
                k2 = ge.ext_sub(
                    b, ge.ext_mul(b, c2l, ge.ext_sub(b, u1, u2)), o2)
                k3 = ge.ext_sub(
                    b, ge.ext_mul(b, ge.ext_mul(b, c2l, cl),
                                  ge.ext_sub(b, d1, jd2)), o3)
            terms = np.stack([k0, k1, k2, k3], axis=1).reshape(-1, 2)
        elif kind == POS1:
            terms = _eval_pos1(b, wires)
        elif kind == CONST:
            terms = ge.ext_sub(b, wires[0:4], consts[0:4])
        elif kind == PI:
            terms = ge.ext_sub(b, wires[0:4], pi_ext)
        else:
            raise ValueError(kind)
        terms = terms.reshape(-1, 2)
        all_terms.append(terms)
        gate_of.extend([gi] * terms.shape[0])
    return np.concatenate(all_terms, axis=0), np.array(gate_of)


# ---------------------------------------------------------------------------
# the verifier circuit
# ---------------------------------------------------------------------------

def verify_proof_circuit(b, shape: ProofShape, gates, pt: ProofTarget,
                         vk_cap, vk_digest, condition) -> None:
    """Constrain: ``pt`` is a valid proof for the circuit whose verifier
    key is (vk_cap, vk_digest) — enforced only when ``condition`` == 1.
    Mirrors prover/verify.py step for step (which itself mirrors plonky2
    verify, the function the reference calls in-circuit at
    ivc_based_vpbs.rs:268-273)."""
    cfg = shape.config
    S = shape.num_selectors
    R = cfg.num_routed_wires
    W = cfg.num_wires
    nc = cfg.num_challenges
    chunk = cfg.perm_chunk_size
    n_chunks = -(-R // chunk)
    per_ch = 1 + n_chunks
    Q = shape.num_queries
    n_lde = shape.n_lde
    n0_bits = _log2(n_lde)
    vk_cap = np.asarray(vk_cap, dtype=np.int64)
    vk_digest = np.asarray(vk_digest, dtype=np.int64)
    dbg = getattr(b, "_dbg", None)  # debug sink: target-id intermediates

    # ---- transcript replay ---------------------------------------------
    pi_hash = b.hash_n_to_hash_no_pad(pt.public_inputs)
    rc = RecursiveChallenger(b)
    rc.observe(vk_digest)
    rc.observe(pi_hash)
    rc.observe(pt.wires_cap.ravel())
    betas = rc.sample_array(nc)
    gammas = rc.sample_array(nc)
    rc.observe(pt.aux_cap.ravel())
    alphas = rc.sample_array(nc)
    rc.observe(pt.quotient_cap.ravel())
    zeta = rc.sample_ext()
    rc.observe(pt.open_z.ravel())
    rc.observe(pt.open_gz.ravel())
    fri_alpha = rc.sample_ext()
    fbetas = []
    for cap_t in pt.fri_caps:
        rc.observe(cap_t.ravel())
        fbetas.append(rc.sample_ext())
    rc.observe(pt.fri_final.ravel())
    rc.observe([pt.pow_witness])
    pow_sample = rc.sample()
    q_samples = rc.sample_array(Q)

    # ---- PoW ------------------------------------------------------------
    # (split_le_vec >= 64 bits is canonicity-enforcing by construction:
    # the BASESUM_CANON row forbids the x+p alias encoding, so the PoW
    # top bits and the query index bits below are the true bits)
    pow_bits_t = b.split_le_vec(np.array([pow_sample]), 64)
    top = pow_bits_t[0, 64 - cfg.fri_pow_bits:]
    b.cond_assert_zero_vec(condition, base_tree_sum(b, top[:, None]))

    # ---- query index bits ----------------------------------------------
    qbits = b.split_le_vec(q_samples, 64)        # (Q, 64)
    idx = qbits[:, :n0_bits]                     # little-endian index bits

    # ---- PLONK identity at zeta ----------------------------------------
    oz = pt.open_z
    n_pre = shape.n_preproc
    sels = oz[:S]
    sigmas = oz[S:S + R]
    consts = oz[S + R:S + R + cfg.num_constants]
    wires = oz[n_pre:n_pre + W]
    aux_z = oz[n_pre + W:n_pre + W + shape.n_aux]
    quot_z = oz[n_pre + W + shape.n_aux:]
    aux_gz = pt.open_gz[n_pre + W:n_pre + W + shape.n_aux]
    pi_ext = ge.ext_from_base(b, pi_hash)

    gate_terms, gate_of = eval_gates_circuit(b, gates, wires, consts, pi_ext)
    sel_stack = sels[gate_of]                    # (T, 2)
    filtered = ge.ext_mul(b, sel_stack, gate_terms)
    if dbg is not None:
        dbg.update(zeta=zeta, betas=betas, gammas=gammas, alphas=alphas,
                   gate_terms=gate_terms, gate_of=gate_of, filtered=filtered,
                   pi_hash=pi_hash)

    # zeta^h by repeated squaring; zh = zeta^h - 1
    zeta_h = zeta
    for _ in range(_log2(shape.h)):
        zeta_h = ge.ext_mul(b, zeta_h, zeta_h)
    one_e = np.array([b.one(), b.zero()], dtype=np.int64)
    zh = ge.ext_sub(b, zeta_h, one_e)
    zeta_m1 = ge.ext_sub(b, zeta, one_e)
    inv_zm1 = ext_inverse_cond(b, condition, zeta_m1)
    l1 = ge.ext_scalar_mul_const(b, ge.ext_mul(b, zh, inv_zm1),
                                 gl.h_inv(shape.h % gl.P))

    # permutation-argument factors, vectorized over the R routed wires
    wires_r = wires[:R]
    k_cosets = np.empty(R, dtype=np.uint64)
    acc = 1
    for c in range(R):
        k_cosets[c] = acc
        acc = gl.h_mul(acc, gl.GENERATOR)

    for i in range(nc):
        beta, gamma, alpha = betas[i], gammas[i], alphas[i]
        z = aux_z[i * per_ch]
        partials = aux_z[i * per_ch + 1:(i + 1) * per_ch]
        z_next = aux_gz[i * per_ch]

        idc = ge.ext_mul_base(b, np.broadcast_to(zeta, (R, 2)),
                              b.constants(k_cosets))
        bnum = ge.ext_mul_base(b, idc, np.full(R, beta, dtype=np.int64))
        bden = ge.ext_mul_base(b, sigmas, np.full(R, beta, dtype=np.int64))
        num_f = ge.ext_add(b, wires_r, bnum)
        den_f = ge.ext_add(b, wires_r, bden)
        gam = np.full(R, gamma, dtype=np.int64)
        num_f = np.stack([b.add_vec(num_f[:, 0], gam), num_f[:, 1]], axis=-1)
        den_f = np.stack([b.add_vec(den_f[:, 0], gam), den_f[:, 1]], axis=-1)

        # chunk products (pad the tail chunk with ext 1)
        pad = n_chunks * chunk - R
        if pad:
            ones = np.broadcast_to(one_e, (pad, 2))
            num_f = np.concatenate([num_f, ones], axis=0)
            den_f = np.concatenate([den_f, ones], axis=0)
        num_m = num_f.reshape(n_chunks, chunk, 2)
        den_m = den_f.reshape(n_chunks, chunk, 2)
        num_prod = num_m[:, 0]
        den_prod = den_m[:, 0]
        for j in range(1, chunk):
            num_prod = ge.ext_mul(b, num_prod, num_m[:, j])
            den_prod = ge.ext_mul(b, den_prod, den_m[:, j])

        prev = np.concatenate([z[None, :], partials[:-1]], axis=0)
        chunk_terms = ge.ext_sub(b, ge.ext_mul(b, partials, den_prod),
                                 ge.ext_mul(b, prev, num_prod))
        l1_term = ge.ext_mul(b, l1, ge.ext_sub(b, z, one_e))
        wrap = ge.ext_sub(b, z_next, partials[-1])
        ch_terms = np.concatenate(
            [filtered, l1_term[None, :], chunk_terms, wrap[None, :]], axis=0)

        alpha_e = np.array([alpha, b.zero()], dtype=np.int64)
        acc_t = b.ext_horner_scan(alpha_e, ch_terms[::-1])

        # t_i(zeta) from the quotient chunks (Horner in zeta^h)
        qdf = 1 << cfg.rate_bits
        tq = quot_z[i * qdf + qdf - 1]
        for j in range(qdf - 2, -1, -1):
            tq = ge.ext_add(b, ge.ext_mul(b, tq, zeta_h),
                            quot_z[i * qdf + j])
        rhs = ge.ext_mul(b, zh, tq)
        if dbg is not None:
            dbg[f"ch{i}"] = dict(ch_terms=ch_terms, acc=acc_t, rhs=rhs,
                                 l1=l1, zh=zh, zeta_h=zeta_h)
        b.cond_assert_eq_vec(condition, acc_t, rhs)

    # ---- FRI: merkle openings ------------------------------------------
    levels = shape.main_levels
    cap_bits = min(cfg.cap_height, n0_bits)
    digests = [b.sponge_vec(pt.main_leaves[o])[:, :4] for o in range(4)]
    dig_all = np.concatenate(digests, axis=0)    # (4Q, 4)
    bits_w = np.tile(idx[:, :levels].T, (1, 4))  # (levels, 4Q)
    sibs_w = np.concatenate([np.moveaxis(pt.main_sibs[o], 1, 0)
                             for o in range(4)], axis=1)
    top = b.merkle_walk_vec(dig_all, bits_w, sibs_w)

    caps = [vk_cap, pt.wires_cap, pt.aux_cap, pt.quotient_cap]
    entries = np.concatenate(
        [np.broadcast_to(c[None], (Q, *c.shape)) for c in caps], axis=0)
    cbits = np.tile(idx[:, levels:levels + cap_bits], (4, 1))  # (4Q, cb)
    for bi in range(cap_bits):
        ctrl = np.broadcast_to(cbits[:, bi][:, None, None],
                               entries[:, 1::2].shape)
        entries = b.select_vec(ctrl, entries[:, 1::2], entries[:, 0::2])
    b.cond_assert_eq_vec(condition, top, entries[:, 0])

    # ---- FRI: G recombination at the query points ----------------------
    C = shape.num_columns
    apows = b.ext_powers_scan(fri_alpha, C + 1)
    aC = apows[C]
    S_z = ext_tree_sum(b, ge.ext_mul(b, apows[:C], oz))
    S_gz = ext_tree_sum(b, ge.ext_mul(b, apows[:C], pt.open_gz))
    P_all = np.concatenate(pt.main_leaves, axis=1)       # (Q, C)
    termP = ge.ext_mul_base(b, np.broadcast_to(apows[None, :C, :],
                                               (Q, C, 2)), P_all)
    sum_p = ext_tree_sum(b, np.moveaxis(termP, 1, 0))    # (Q, 2)
    bz = ge.ext_sub(b, sum_p, np.broadcast_to(S_z, (Q, 2)))
    bgz = ge.ext_sub(b, sum_p, np.broadcast_to(S_gz, (Q, 2)))

    g_root = gl.primitive_root_of_unity(n_lde)
    x0 = _bit_ladder(b, idx, _pow_table(g_root, n0_bits), COSET_SHIFT)
    gz_c = gl.h_mul(1, gl.primitive_root_of_unity(shape.h))
    gzeta = ge.ext_mul_base(b, zeta[None, :],
                            np.array([b.constant(gz_c)]))[0]

    def x_minus(pt_ext):
        d0 = b.sub_vec(x0, np.full(Q, pt_ext[0], dtype=np.int64))
        d1 = b.neg_vec(np.full(Q, pt_ext[1], dtype=np.int64))
        return np.stack([d0, d1], axis=-1)

    inv_z = ext_inverse_cond(b, condition, x_minus(zeta))
    inv_gz = ext_inverse_cond(b, condition, x_minus(gzeta))
    g_val = ge.ext_add(
        b, ge.ext_mul(b, bz, inv_z),
        ge.ext_mul(b, np.broadcast_to(aC, (Q, 2)),
                   ge.ext_mul(b, bgz, inv_gz)))

    # ---- FRI: fold layers ----------------------------------------------
    from ..prover.fri import _omega_dft_table
    value = g_val
    shift = COSET_SHIFT
    for li, n_l in enumerate(shape.fri_sizes):
        m = n_l // 4
        mbits = _log2(m)
        leaf = pt.fri_leaves[li]                 # (Q, 4, 2)
        # leaf[t] == value for t = idx[mbits:mbits+2]
        t0 = idx[:, mbits]
        t1 = idx[:, mbits + 1]
        s01 = ge.ext_select(b, t0, leaf[:, 1], leaf[:, 0])
        s23 = ge.ext_select(b, t0, leaf[:, 3], leaf[:, 2])
        sel = ge.ext_select(b, t1, s23, s01)
        b.cond_assert_eq_vec(condition, sel, value)

        # merkle path over the layer tree
        lv = shape.layer_levels(li)
        lcap_bits = mbits - lv
        dig = b.sponge_vec(leaf.reshape(Q, 8))[:, :4]
        topd = b.merkle_walk_vec(dig, idx[:, :lv].T,
                                 np.moveaxis(pt.fri_sibs[li], 1, 0))
        entries = np.broadcast_to(pt.fri_caps[li][None],
                                  (Q, *pt.fri_caps[li].shape))
        for bi in range(lcap_bits):
            ctrl = np.broadcast_to(idx[:, lv + bi][:, None, None],
                                   entries[:, 1::2].shape)
            entries = b.select_vec(ctrl, entries[:, 1::2], entries[:, 0::2])
        b.cond_assert_eq_vec(condition, topd, entries[:, 0])

        # fold: value' = (1/4) sum_j (beta/x)^j sum_t w^{-jt} leaf[t]
        dft = _omega_dft_table(n_l, 4)           # (4, 4) constants
        prod = ge.ext_mul_base(
            b, np.broadcast_to(leaf[:, None, :, :], (Q, 4, 4, 2)),
            b.constants(np.tile(dft[None], (Q, 1, 1))).reshape(Q, 4, 4))
        wj = ext_tree_sum(b, np.moveaxis(prod, 2, 0))    # (Q, 4, 2)
        kinv = gl.h_inv(gl.primitive_root_of_unity(n_l))
        x_inv = _bit_ladder(b, idx[:, :mbits], _pow_table(kinv, mbits),
                            gl.h_inv(shift % gl.P))
        bx = ge.ext_mul_base(b, np.broadcast_to(fbetas[li], (Q, 2)), x_inv)
        acc_f = wj[:, 3]
        for j in (2, 1, 0):
            acc_f = ge.ext_add(b, ge.ext_mul(b, acc_f, bx), wj[:, j])
        value = ge.ext_mul_base(
            b, acc_f, np.full(Q, b.constant(gl.h_inv(4)), dtype=np.int64))
        shift = gl.h_pow(shift, 4)

    # ---- FRI: final polynomial -----------------------------------------
    n_fin = shape.final_n
    fin_bits = _log2(n_fin)
    k_fin = gl.primitive_root_of_unity(n_fin)
    x_fin = _bit_ladder(b, idx[:, :fin_bits], _pow_table(k_fin, fin_bits),
                        shift % gl.P)
    F = shape.final_len
    acc_p = np.broadcast_to(pt.fri_final[F - 1], (Q, 2))
    for ci in range(F - 2, -1, -1):
        acc_p = ge.ext_add(b, ge.ext_mul_base(b, acc_p, x_fin),
                           np.broadcast_to(pt.fri_final[ci], (Q, 2)))
    b.cond_assert_eq_vec(condition, value, acc_p)
