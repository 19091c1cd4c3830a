"""Gate constraint evaluators, generic over the evaluation field.

Each gate kind (circuit/builder.py) yields a list of constraint values
that must vanish on rows where its selector is 1. The same evaluator code
runs in two modes:

* prover: values are (n_points,) base-field columns over the LDE coset —
  one vectorized pass evaluates every constraint on every point;
* verifier: values are (2,) quadratic-extension elements at zeta.

This mirrors plonky2's Gate::eval_unfiltered / eval_filtered split
without the trait machinery: an ``ops`` namespace provides the field.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as ee
from ..hashing import constants as HC
from ..circuit.builder import (NOOP, ARITH, BASESUM, BASESUM_CANON, POS1,
                               CONST, PI, SELECT, NTTBF, NTTBF_INV, DECOMP,
                               NTTBF4, NTTBF4_INV, DOT, CSEL, ARITH_LANES,
                               SELECT_LANES, NTTBF_LANES, NTTBF4_LANES,
                               CSEL_LANES, NTT_J, NTT_JI)

_EPS32 = (1 << 32) - 1


class BaseOps:
    """Vectorized base-field ops on (n,) uint64 arrays."""
    add = staticmethod(gl.add)
    sub = staticmethod(gl.sub)
    mul = staticmethod(gl.mul)

    @staticmethod
    def mul_int(x, c: int):
        return gl.mul(x, jnp.uint64(c % gl.P))

    @staticmethod
    def add_int(x, c: int):
        return gl.add(x, jnp.uint64(c % gl.P))

    @staticmethod
    def one_minus(x):
        return gl.sub(jnp.uint64(1), x)


class ExtOps:
    """Quadratic-extension ops on (..., 2) arrays."""
    add = staticmethod(ee.add)
    sub = staticmethod(ee.sub)
    mul = staticmethod(ee.mul)

    @staticmethod
    def mul_int(x, c: int):
        return gl.mul(x, jnp.uint64(c % gl.P))  # scalar mult both coords

    @staticmethod
    def add_int(x, c: int):
        return x.at[..., 0].set(gl.add(x[..., 0], jnp.uint64(c % gl.P)))

    @staticmethod
    def one_minus(x):
        out = ee.neg(x)
        return out.at[..., 0].set(gl.add(out[..., 0], jnp.uint64(1)))


def _sbox(F, x):
    x2 = F.mul(x, x)
    x4 = F.mul(x2, x2)
    return F.mul(F.mul(x4, x2), x)


def _poseidon_round(F, state, r: int):
    """One Poseidon round (constants first, sbox, MDS) in constraint form."""
    rc = HC.all_round_constants()[r]
    mds = HC.mds_matrix()
    state = [F.add_int(s, int(rc[i])) for i, s in enumerate(state)]
    full = (r < HC.HALF_FULL_ROUNDS or
            r >= HC.HALF_FULL_ROUNDS + HC.N_PARTIAL_ROUNDS)
    if full:
        state = [_sbox(F, s) for s in state]
    else:
        state = [_sbox(F, state[0])] + state[1:]
    out = []
    for i in range(HC.WIDTH):
        acc = F.mul_int(state[0], int(mds[i, 0]))
        for j in range(1, HC.WIDTH):
            acc = F.add(acc, F.mul_int(state[j], int(mds[i, j])))
        out.append(acc)
    return out


def eval_gate(gate, F, wires, consts, pi_hash) -> list:
    """Constraints for one gate kind.

    wires: list of num_wires column values; consts: list of constant-column
    values; pi_hash: list of 4 values (only used by the PI gate).
    """
    kind = gate.kind
    cs = []
    if kind == ARITH:
        k0, k1 = consts[0], consts[1]
        for l in range(ARITH_LANES):
            a, b, c, out = (wires[4 * l + i] for i in range(4))
            val = F.add(F.mul(k0, F.mul(a, b)), F.mul(k1, c))
            cs.append(F.sub(val, out))
    elif kind == BASESUM:
        nbits = gate.param
        for lane in range(gate.lanes):
            base = lane * (1 + nbits)
            s = wires[base]
            acc = None
            for i in range(nbits):
                b = wires[base + 1 + i]
                cs.append(F.mul(b, F.sub(b, _one(F, b))))
                term = F.mul_int(b, pow(2, i, gl.P))
                acc = term if acc is None else F.add(acc, term)
            cs.append(F.sub(acc, s))
    elif kind == BASESUM_CANON:
        # per lane: nbits bit rows (boolean below 64, pinned-zero above),
        # recombination, lo/hi half-sums, (hi-eps)*u == t1, lo*(t1-1) == 0
        nbits = gate.param
        for lane in range(gate.lanes):
            base = lane * (nbits + 5)
            s = wires[base]
            lo, hi, u, t1 = (wires[base + 1 + nbits + k] for k in range(4))
            acc = lo_acc = hi_acc = None
            for i in range(nbits):
                b = wires[base + 1 + i]
                if i < 64:
                    cs.append(F.mul(b, F.sub(b, _one(F, b))))
                else:
                    cs.append(b)
                term = F.mul_int(b, pow(2, i, gl.P))
                acc = term if acc is None else F.add(acc, term)
                if i < 32:
                    t = F.mul_int(b, 1 << i)
                    lo_acc = t if lo_acc is None else F.add(lo_acc, t)
                elif i < 64:
                    t = F.mul_int(b, 1 << (i - 32))
                    hi_acc = t if hi_acc is None else F.add(hi_acc, t)
            cs.append(F.sub(acc, s))
            cs.append(F.sub(lo_acc, lo))
            cs.append(F.sub(hi_acc, hi))
            cs.append(F.sub(F.mul(F.add_int(hi, gl.P - _EPS32), u), t1))
            cs.append(F.mul(lo, F.sub(t1, _one(F, t1))))
    elif kind == DECOMP:
        # wires [x, balanced(nl), bits(nbits), aux(4)]; constraint order:
        # bools (pinned-zero past 63), recomb, lo, hi, t1row, canon,
        # then nl balanced-limb rows (merged le_sum + carry/balancer)
        nbits, logb = gate.param >> 8, gate.param & 0xFF
        nl = nbits // logb
        x = wires[0]
        bal = [wires[1 + i] for i in range(nl)]
        bit_w = [wires[1 + nl + i] for i in range(nbits)]
        lo, hi, u, t1 = (wires[1 + nl + nbits + k] for k in range(4))
        acc = lo_acc = hi_acc = None
        for i in range(nbits):
            bw = bit_w[i]
            if i < 64:
                cs.append(F.mul(bw, F.sub(bw, _one(F, bw))))
            else:
                cs.append(bw)
            term = F.mul_int(bw, pow(2, i, gl.P))
            acc = term if acc is None else F.add(acc, term)
            if i < 32:
                t = F.mul_int(bw, 1 << i)
                lo_acc = t if lo_acc is None else F.add(lo_acc, t)
            elif i < 64:
                t = F.mul_int(bw, 1 << (i - 32))
                hi_acc = t if hi_acc is None else F.add(hi_acc, t)
        cs.append(F.sub(acc, x))
        cs.append(F.sub(lo_acc, lo))
        cs.append(F.sub(hi_acc, hi))
        cs.append(F.sub(F.mul(F.add_int(hi, gl.P - _EPS32), u), t1))
        cs.append(F.mul(lo, F.sub(t1, _one(F, t1))))
        for i in range(nl):
            lacc = None
            for j in range(logb):
                t = F.mul_int(bit_w[i * logb + j], 1 << j)
                lacc = t if lacc is None else F.add(lacc, t)
            if i:
                lacc = F.add(lacc, bit_w[i * logb - 1])
            lacc = F.add(lacc, F.mul_int(bit_w[(i + 1) * logb - 1],
                                         gl.P - (1 << logb)))
            cs.append(F.sub(lacc, bal[i]))
    elif kind in (NTTBF, NTTBF_INV):
        for l in range(NTTBF_LANES):
            u_w, v_w, o1, o2 = (wires[4 * l + i] for i in range(4))
            c = consts[l]
            if kind == NTTBF:
                s = F.mul(c, v_w)
                cs.append(F.sub(F.add(u_w, s), o1))
                cs.append(F.sub(F.sub(u_w, s), o2))
            else:
                cs.append(F.sub(F.add(u_w, v_w), o1))
                cs.append(F.sub(F.mul(c, F.sub(u_w, v_w)), o2))
    elif kind == DOT:
        mask, J = gate.param >> 8, gate.param & 0xFF
        for l in range(gate.lanes):
            base = l * (2 * J + 2)
            acc = wires[base + 2 * J]                      # c
            for j in range(J):
                prod = F.mul(wires[base + 2 * j], wires[base + 2 * j + 1])
                acc = F.sub(acc, prod) if (mask >> j) & 1 \
                    else F.add(acc, prod)
            cs.append(F.sub(acc, wires[base + 2 * J + 1]))
    elif kind == CSEL:
        bit = wires[0]
        for l in range(CSEL_LANES):
            x, y, out = (wires[1 + 3 * l + i] for i in range(3))
            if gate.param:                                 # negated x
                x = F.mul_int(x, gl.P - 1)
            cs.append(F.sub(F.add(F.mul(bit, F.sub(x, y)), y), out))
    elif kind in (NTTBF4, NTTBF4_INV):
        # radix-4 butterfly: one constant s per lane, w = s^2 and
        # w_odd = J*s by the twiddle-table identity (builder.NTT_J)
        for l in range(NTTBF4_LANES):
            A, B, C, D, o0, o1, o2, o3 = (wires[8 * l + i]
                                          for i in range(8))
            c = consts[l]
            c2 = F.mul(c, c)
            if kind == NTTBF4:
                t1 = F.mul(c2, C)
                t2 = F.mul(c, B)
                t3 = F.mul(F.mul(c2, c), D)
                x1 = F.add(A, t1)
                y1 = F.add(t2, t3)
                cs.append(F.sub(F.add(x1, y1), o0))
                cs.append(F.sub(F.sub(x1, y1), o1))
                xm = F.sub(A, t1)
                ym = F.mul_int(F.sub(t2, t3), NTT_J)
                cs.append(F.sub(F.add(xm, ym), o2))
                cs.append(F.sub(F.sub(xm, ym), o3))
            else:
                u1, d1 = F.add(A, B), F.sub(A, B)
                u2, d2 = F.add(C, D), F.sub(C, D)
                jd2 = F.mul_int(d2, NTT_JI)
                cs.append(F.sub(F.add(u1, u2), o0))
                cs.append(F.sub(F.mul(c, F.add(d1, jd2)), o1))
                cs.append(F.sub(F.mul(c2, F.sub(u1, u2)), o2))
                cs.append(F.sub(F.mul(F.mul(c2, c), F.sub(d1, jd2)),
                                o3))
    elif kind == POS1:
        # one whole permutation per row; see builder.py POS1 wire layout
        # and hashing/constants.pos1_affine_data for the partial-round
        # affine folding. Constraint order: full rounds 0..3 (12 each),
        # partial sboxes j=0..21 (1 each), full rounds 26..29 (12 each).
        a0, b0, c0, A26, B26, c26 = HC.pos1_affine_data()
        s4w = [wires[60 + i] for i in range(12)]      # state after round 3
        sbw = [wires[72 + j] for j in range(22)]      # partial sbox outs
        state = [wires[i] for i in range(12)]
        for k in range(HC.HALF_FULL_ROUNDS):
            out = _poseidon_round(F, state, k)
            nxt = [wires[24 + 12 * k + i] for i in range(12)]
            cs.extend(F.sub(out[i], nxt[i]) for i in range(12))
            state = nxt
        for j in range(HC.N_PARTIAL_ROUNDS):
            acc = None
            for i in range(12):
                if int(a0[j, i]):
                    t = F.mul_int(s4w[i], int(a0[j, i]))
                    acc = t if acc is None else F.add(acc, t)
            for k in range(j):
                if int(b0[j, k]):
                    t = F.mul_int(sbw[k], int(b0[j, k]))
                    acc = t if acc is None else F.add(acc, t)
            acc = F.add_int(acc, int(c0[j]))
            cs.append(F.sub(_sbox(F, acc), sbw[j]))
        x26 = []
        for i in range(12):
            acc = None
            for k in range(12):
                if int(A26[i, k]):
                    t = F.mul_int(s4w[k], int(A26[i, k]))
                    acc = t if acc is None else F.add(acc, t)
            for k in range(22):
                if int(B26[i, k]):
                    t = F.mul_int(sbw[k], int(B26[i, k]))
                    acc = t if acc is None else F.add(acc, t)
            x26.append(F.add_int(acc, int(c26[i])))
        state = x26
        targets = ([wires[94 + 12 * k:94 + 12 * (k + 1)] for k in range(3)]
                   + [wires[12:24]])
        for k in range(4):
            out = _poseidon_round(F, state, 26 + k)
            nxt = list(targets[k])
            cs.extend(F.sub(out[i], nxt[i]) for i in range(12))
            state = nxt
    elif kind == SELECT:
        for l in range(SELECT_LANES):
            b, x, y, out = (wires[4 * l + i] for i in range(4))
            val = F.add(F.mul(b, F.sub(x, y)), y)
            cs.append(F.sub(val, out))
    elif kind == CONST:
        for j in range(4):
            cs.append(F.sub(wires[j], consts[j]))
    elif kind == PI:
        for j in range(4):
            cs.append(F.sub(wires[j], pi_hash[j]))
    else:
        raise ValueError(kind)
    return cs


def _one(F, like):
    if F is BaseOps:
        return jnp.ones_like(like)
    if isinstance(like, tuple):
        return (1, 0)
    out = jnp.zeros_like(like)
    return out.at[..., 0].set(1)


def eval_gate_stacked(gate, wire_lde: jnp.ndarray, const_lde: jnp.ndarray,
                      pi_hash: jnp.ndarray) -> jnp.ndarray:
    """Prover-side evaluator: all of a gate's constraints as ONE
    (num_constraints, n) tensor over the LDE coset. Must produce the same
    values in the same ORDER as eval_gate (the verifier's scalar path).
    """
    kind = gate.kind
    n = wire_lde.shape[1]
    if kind == ARITH:
        idx = np.arange(ARITH_LANES) * 4
        a = wire_lde[idx]
        b = wire_lde[idx + 1]
        c = wire_lde[idx + 2]
        out = wire_lde[idx + 3]
        k0 = const_lde[0][None, :]
        k1 = const_lde[1][None, :]
        return gl.sub(gl.add(gl.mul(k0, gl.mul(a, b)), gl.mul(k1, c)), out)
    if kind == BASESUM:
        nb = gate.param
        lanes = gate.lanes
        # lane l occupies wires [l*(1+nb) .. l*(1+nb)+nb]
        mat = wire_lde[:lanes * (1 + nb)].reshape(lanes, 1 + nb, n)
        s = mat[:, 0]                                  # (lanes, n)
        bits = mat[:, 1:]                              # (lanes, nb, n)
        bools = gl.mul(bits, gl.sub(bits, jnp.uint64(1)))
        pows = np.array([pow(2, i, gl.P) for i in range(nb)], dtype=np.uint64)
        weighted = gl.mul(bits, jnp.asarray(pows)[None, :, None])

        def body(carry, row):
            return gl.add(carry, row), None

        total, _ = jax.lax.scan(body, jnp.zeros((lanes, n), jnp.uint64),
                                jnp.moveaxis(weighted, 1, 0))
        recomb = gl.sub(total, s)[:, None, :]          # (lanes, 1, n)
        # order: per lane: bools then recomb (matches eval_gate)
        out = jnp.concatenate([bools, recomb], axis=1)  # (lanes, nb+1, n)
        return out.reshape(lanes * (nb + 1), n)
    if kind == BASESUM_CANON:
        nb = gate.param
        lanes = gate.lanes
        mat = wire_lde[:lanes * (nb + 5)].reshape(lanes, nb + 5, n)
        s = mat[:, 0]
        bits = mat[:, 1:1 + nb]                        # (lanes, nb, n)
        lo, hi, u, t1 = (mat[:, 1 + nb + k] for k in range(4))
        bools = gl.mul(bits, gl.sub(bits, jnp.uint64(1)))
        if nb > 64:
            bools = jnp.concatenate([bools[:, :64], bits[:, 64:]], axis=1)
        pows = np.array([pow(2, i, gl.P) for i in range(nb)],
                        dtype=np.uint64)
        weighted = gl.mul(bits, jnp.asarray(pows)[None, :, None])

        def body(carry, row):
            return gl.add(carry, row), None

        total, _ = jax.lax.scan(body, jnp.zeros((lanes, n), jnp.uint64),
                                jnp.moveaxis(weighted, 1, 0))
        pows32 = jnp.asarray(
            np.array([1 << i for i in range(32)], dtype=np.uint64))
        w_lo = gl.mul(bits[:, :32], pows32[None, :, None])
        lo_sum, _ = jax.lax.scan(body, jnp.zeros((lanes, n), jnp.uint64),
                                 jnp.moveaxis(w_lo, 1, 0))
        w_hi = gl.mul(bits[:, 32:64], pows32[None, :, None])
        hi_sum, _ = jax.lax.scan(body, jnp.zeros((lanes, n), jnp.uint64),
                                 jnp.moveaxis(w_hi, 1, 0))
        eps = jnp.uint64(_EPS32)
        t1row = gl.sub(gl.mul(gl.sub(hi, eps), u), t1)
        canon = gl.mul(lo, gl.sub(t1, jnp.uint64(1)))
        out = jnp.concatenate(
            [bools, gl.sub(total, s)[:, None], gl.sub(lo_sum, lo)[:, None],
             gl.sub(hi_sum, hi)[:, None], t1row[:, None], canon[:, None]],
            axis=1)                                    # (lanes, nb+5, n)
        return out.reshape(lanes * (nb + 5), n)
    if kind == SELECT:
        idx = np.arange(SELECT_LANES) * 4
        b = wire_lde[idx]
        x = wire_lde[idx + 1]
        y = wire_lde[idx + 2]
        out = wire_lde[idx + 3]
        return gl.sub(gl.add(gl.mul(b, gl.sub(x, y)), y), out)
    if kind == DECOMP:
        nb, logb = gate.param >> 8, gate.param & 0xFF
        nl = nb // logb
        x = wire_lde[0]
        bal = wire_lde[1:1 + nl]                       # (nl, n)
        bits = wire_lde[1 + nl:1 + nl + nb]            # (nb, n)
        lo, hi, u, t1 = (wire_lde[1 + nl + nb + k] for k in range(4))
        bools = gl.mul(bits, gl.sub(bits, jnp.uint64(1)))
        if nb > 64:
            bools = jnp.concatenate([bools[:64], bits[64:]], axis=0)
        pows = jnp.asarray(np.array([pow(2, i, gl.P) for i in range(nb)],
                                    dtype=np.uint64))
        weighted = gl.mul(bits, pows[:, None])

        def body(carry, row):
            return gl.add(carry, row), None

        total, _ = jax.lax.scan(body, jnp.zeros_like(x), weighted)
        pows32 = jnp.asarray(
            np.array([1 << i for i in range(32)], dtype=np.uint64))
        lo_sum, _ = jax.lax.scan(body, jnp.zeros_like(x),
                                 gl.mul(bits[:32], pows32[:, None]))
        hi_sum, _ = jax.lax.scan(body, jnp.zeros_like(x),
                                 gl.mul(bits[32:64], pows32[:, None]))
        t1row = gl.sub(gl.mul(gl.sub(hi, jnp.uint64(_EPS32)), u), t1)
        canon = gl.mul(lo, gl.sub(t1, jnp.uint64(1)))
        powsl = jnp.asarray(
            np.array([1 << j for j in range(logb)], dtype=np.uint64))
        lb = gl.mul(bits[:nl * logb].reshape(nl, logb, -1),
                    powsl[None, :, None])
        lsum, _ = jax.lax.scan(body, jnp.zeros((nl, x.shape[0]),
                                               jnp.uint64),
                               jnp.moveaxis(lb, 1, 0))
        carry = bits[logb - 1::logb]                   # (nl, n) top bits
        prev_c = jnp.concatenate(
            [jnp.zeros((1, x.shape[0]), jnp.uint64), carry[:-1]], axis=0)
        lsum = gl.sub(gl.add(lsum, prev_c),
                      gl.mul(jnp.uint64(1 << logb), carry))
        return jnp.concatenate(
            [bools, gl.sub(total, x)[None], gl.sub(lo_sum, lo)[None],
             gl.sub(hi_sum, hi)[None], t1row[None], canon[None],
             gl.sub(lsum, bal)], axis=0)
    if kind in (NTTBF, NTTBF_INV):
        idx = np.arange(NTTBF_LANES) * 4
        u = wire_lde[idx]
        v = wire_lde[idx + 1]
        o1 = wire_lde[idx + 2]
        o2 = wire_lde[idx + 3]
        c = const_lde[0:NTTBF_LANES]
        if kind == NTTBF:
            s = gl.mul(c, v)
            c1 = gl.sub(gl.add(u, s), o1)
            c2 = gl.sub(gl.sub(u, s), o2)
        else:
            c1 = gl.sub(gl.add(u, v), o1)
            c2 = gl.sub(gl.mul(c, gl.sub(u, v)), o2)
        # order: per lane (c1, c2) — matches eval_gate
        return jnp.stack([c1, c2], axis=1).reshape(2 * NTTBF_LANES, -1)
    if kind == DOT:
        mask, J = gate.param >> 8, gate.param & 0xFF
        lanes = gate.lanes
        idx = np.arange(lanes) * (2 * J + 2)
        acc = wire_lde[idx + 2 * J]                        # c, (lanes, n)
        for j in range(J):
            prod = gl.mul(wire_lde[idx + 2 * j], wire_lde[idx + 2 * j + 1])
            acc = gl.sub(acc, prod) if (mask >> j) & 1 \
                else gl.add(acc, prod)
        # order: one constraint per lane — matches eval_gate
        return gl.sub(acc, wire_lde[idx + 2 * J + 1])
    if kind == CSEL:
        bit = wire_lde[0][None, :]                         # (1, n)
        idx = 1 + np.arange(CSEL_LANES) * 3
        x = wire_lde[idx]
        y = wire_lde[idx + 1]
        out = wire_lde[idx + 2]
        if gate.param:
            x = gl.neg(x)
        return gl.sub(gl.add(gl.mul(bit, gl.sub(x, y)), y), out)
    if kind in (NTTBF4, NTTBF4_INV):
        idx = np.arange(NTTBF4_LANES) * 8
        A, B, C, D = (wire_lde[idx + j] for j in range(4))
        o0, o1, o2, o3 = (wire_lde[idx + 4 + j] for j in range(4))
        c = const_lde[0:NTTBF4_LANES]
        c2 = gl.mul(c, c)
        if kind == NTTBF4:
            t1 = gl.mul(c2, C)
            t2 = gl.mul(c, B)
            t3 = gl.mul(gl.mul(c2, c), D)
            x1, y1 = gl.add(A, t1), gl.add(t2, t3)
            k0 = gl.sub(gl.add(x1, y1), o0)
            k1 = gl.sub(gl.sub(x1, y1), o1)
            xm = gl.sub(A, t1)
            ym = gl.mul(jnp.uint64(NTT_J), gl.sub(t2, t3))
            k2 = gl.sub(gl.add(xm, ym), o2)
            k3 = gl.sub(gl.sub(xm, ym), o3)
        else:
            u1, d1 = gl.add(A, B), gl.sub(A, B)
            u2, d2 = gl.add(C, D), gl.sub(C, D)
            jd2 = gl.mul(jnp.uint64(NTT_JI), d2)
            k0 = gl.sub(gl.add(u1, u2), o0)
            k1 = gl.sub(gl.mul(c, gl.add(d1, jd2)), o1)
            k2 = gl.sub(gl.mul(c2, gl.sub(u1, u2)), o2)
            k3 = gl.sub(gl.mul(gl.mul(c2, c), gl.sub(d1, jd2)), o3)
        # order: per lane (k0, k1, k2, k3) — matches eval_gate
        return jnp.stack([k0, k1, k2, k3],
                         axis=1).reshape(4 * NTTBF4_LANES, -1)
    if kind == POS1:
        return _pos1_stacked(wire_lde)
    if kind == CONST:
        return gl.sub(wire_lde[0:4], const_lde[0:4])
    if kind == PI:
        return gl.sub(wire_lde[0:4], pi_hash[:, None])
    raise ValueError(kind)


def _pos1_stacked(wire_lde: jnp.ndarray) -> jnp.ndarray:
    """Tensorized POS1 gate constraints, order-matched to eval_gate."""
    from ..hashing import poseidon as HPm
    rc = HC.all_round_constants()
    a0, b0, c0, A26, B26, c26 = HC.pos1_affine_data()
    s4 = wire_lde[60:72]                           # (12, n)
    sb = wire_lde[72:94]                           # (22, n)
    cs = []

    # full rounds 0..3 against wired states
    state = jnp.transpose(wire_lde[0:12])          # (n, 12)
    for k in range(HC.HALF_FULL_ROUNDS):
        out = HPm._mds(HPm._sbox(gl.add(state, jnp.asarray(rc[k]))))
        nxt = jnp.transpose(wire_lde[24 + 12 * k:36 + 12 * k])
        cs.append(jnp.transpose(gl.sub(out, nxt)))  # (12, n)
        state = nxt

    # partial rounds: sbox-input = a0 @ s4 + b0 @ sb + c0  (affine)
    def dot_rows(mat, cols):
        # (R, K) constant @ (K, n) columns -> (R, n), modular
        acc = jnp.zeros((mat.shape[0], cols.shape[1]), jnp.uint64)
        for k in range(mat.shape[1]):
            acc = gl.add(acc, gl.mul(jnp.asarray(mat[:, k])[:, None],
                                     cols[k][None, :]))
        return acc

    y0 = gl.add(gl.add(dot_rows(a0, s4), dot_rows(b0, sb)),
                jnp.asarray(c0)[:, None])          # (22, n)
    x2 = gl.mul(y0, y0)
    x4 = gl.mul(x2, x2)
    x7 = gl.mul(gl.mul(x4, x2), y0)
    cs.append(gl.sub(x7, sb))                      # (22, n)

    # full rounds 26..29; round-26 input is affine in (s4, sb)
    x26 = gl.add(gl.add(dot_rows(A26, s4), dot_rows(B26, sb)),
                 jnp.asarray(c26)[:, None])        # (12, n)
    state = jnp.transpose(x26)
    targets = [wire_lde[94:106], wire_lde[106:118], wire_lde[118:130],
               wire_lde[12:24]]
    for k in range(4):
        out = HPm._mds(HPm._sbox(gl.add(state, jnp.asarray(rc[26 + k]))))
        nxt = jnp.transpose(targets[k])
        cs.append(jnp.transpose(gl.sub(out, nxt)))
        state = nxt
    return jnp.concatenate(cs, axis=0)


def num_gate_constraints(gates) -> int:
    n = 0
    for g in gates:
        if g.kind == ARITH:
            n += ARITH_LANES
        elif g.kind == BASESUM:
            n += (g.param + 1) * g.lanes
        elif g.kind == BASESUM_CANON:
            n += (g.param + 5) * g.lanes
        elif g.kind == SELECT:
            n += SELECT_LANES
        elif g.kind == DECOMP:
            nb, logb = g.param >> 8, g.param & 0xFF
            n += nb + 5 + nb // logb
        elif g.kind in (NTTBF, NTTBF_INV):
            n += 2 * NTTBF_LANES
        elif g.kind in (NTTBF4, NTTBF4_INV):
            n += 4 * NTTBF4_LANES
        elif g.kind == DOT:
            n += g.lanes
        elif g.kind == CSEL:
            n += CSEL_LANES
        elif g.kind == POS1:
            n += 12 * HC.N_FULL_ROUNDS + HC.N_PARTIAL_ROUNDS
        elif g.kind in (CONST, PI):
            n += 4
    return n
