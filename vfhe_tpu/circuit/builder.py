"""TPU-native circuit builder: the plonky2 ``CircuitBuilder`` equivalent.

The reference builds ONE universal step circuit through plonky2's gate
DSL and then proves it n+2 times (ivc_based_vpbs.rs:190-275, SURVEY.md
section 7). This builder keeps that API surface — targets, virtual
targets, public inputs, ``add/sub/mul/mul_add/select/is_equal/split_le/
le_sum/connect/constant/hash_n_to_hash_no_pad`` (the exact surface the
reference uses, SURVEY.md L0) — but records *vectorized* ops: gadget
layers call the ``*_vec`` forms, so an entire NTT butterfly stage or a
whole polynomial decomposition is ONE ledger entry. Consequences:

* witness generation compiles to a single jit'd JAX function (a few
  hundred wide vector ops instead of millions of scalar generators);
* constraint rows are assembled with bulk numpy, no per-gate python;
* proving is batched row-parallel math downstream (fft/merkle/fri).

Gate set (each row is one gate instance; wires beyond a gate's use are
zero-filled and unrouted):

  ARITH     20 lanes of plonky2's arithmetic op out = k0*a*b + k1*c,
            lane wires [a, b, c, out] in the routed region; (k0, k1) sit
            in constant columns 0/1 and are shared per row.
  BASESUM_b wires [sum, bit_0 .. bit_{b-1}]; constraints: binary bits +
            little-endian recombination (plonky2 BaseSumGate<2>).
  BASESUM_CANON_b (b >= 64) wires [sum, bits.., lo, hi, u, t1]; the
            BASESUM constraints (bits past 63 pinned to zero) plus
            canonical-encoding enforcement in the same row:
            lo/hi = 32-bit half sums, (hi - eps)*u == t1,
            lo*(t1 - 1) == 0  (so hi == eps forces lo == 0).
  POS1      a WHOLE Poseidon permutation in one 130-wire row (the same
            packing idea as plonky2's PoseidonGate, which is what the
            reference proves with): wires [state_in(12) | state_out(12) |
            full-round states r0..r3 (48) | 22 partial-round sbox
            outputs | full-round states r26..r28 (36)]. The partial
            rounds are affine in (state_r3, sbox outs) — see
            hashing/constants.pos1_affine_data — so 22 degree-7
            constraints + 8x12 full-round constraints cover all 30
            rounds; 118 constraints, max degree 7.
  CONST     4 wires pinned to constant columns (plonky2 ConstantGate).
  PI        4 wires pinned to the public-input hash (PublicInputGate).
  NOOP      padding.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..hashing import constants as HC
from ..hashing import poseidon as HP
from .config import CircuitConfig, STANDARD_CONFIG

# gate kind tags
(NOOP, ARITH, BASESUM, POS1, CONST, PI, SELECT, BASESUM_CANON,
 NTTBF, NTTBF_INV, DECOMP, NTTBF4, NTTBF4_INV, DOT, CSEL) = range(15)
SELECT_LANES = 20
CSEL_LANES = 26           # shared-bit selects: wires [bit | 26 x (x,y,out)]


def dot_lanes(num_routed: int, npairs: int) -> int:
    """DOT gate lanes per row: each lane is [a_0,b_0,..,a_{J-1},b_{J-1},
    c, out] = 2J+2 wires."""
    return max(1, num_routed // (2 * npairs + 2))
NTTBF_LANES = 20          # butterflies per row; twiddle in const col l
NTTBF4_LANES = 10         # radix-4 butterflies per row (8 wires each)
# The bit-reversed negacyclic twiddle tables satisfy, for EVERY stage
# pair (m, 2m) and group g:  roots[2m+2g]^2 == roots[m+g]  and
# roots[2m+2g+1] == J * roots[2m+2g]  with J = 2^48 (J^2 = 2^96 = -1
# mod p); same for invroots with Ji = -2^48 = J^-1. One constant per
# radix-4 lane therefore encodes all three stage twiddles.
NTT_J = 1 << 48
NTT_JI = 0xFFFFFFFF00000001 - (1 << 48)

ARITH_LANES = 20
# Rounds whose (post-MDS) output states are wired in a POS1 row; the
# remaining 22 partial-round states are affine in these + the sbox wires.
POS1_KEEP = (0, 1, 2, 3, 26, 27, 28, 29)
POS1_OUT_IDX = 7          # index of round 29 within POS1_KEEP


def _np_idx(x) -> np.ndarray:
    return np.atleast_1d(np.asarray(x, dtype=np.int64))


@dataclass
class _WitnessOp:
    kind: str
    data: dict


@dataclass
class GateInstance:
    kind: int
    param: int = 0      # BASESUM: nbits
    selector: int = -1  # assigned at build
    lanes: int = 1      # BASESUM: lanes packed per row


class CircuitBuilder:
    """Records ops + constraint rows; ``build()`` freezes everything."""

    def __init__(self, config: CircuitConfig = STANDARD_CONFIG):
        self.config = config
        self._num_targets = 0
        self._ops: list[_WitnessOp] = []
        self._defined = set()        # targets produced by some op
        self._const_map: dict[int, int] = {}
        self._copies: list[tuple[int, int]] = []
        self._pis: list[int] = []
        # row ledgers
        self._arith_groups: dict[tuple[int, int], list] = {}
        self._basesum: dict[int, list] = {}   # nbits -> [(sum(L,), bits(L,b))]
        # nbits -> [(sum(L,), bits(L,b), aux(L,4)=[lo,hi,u,t1])]
        self._basesum_canon: dict[int, list] = {}
        self._poseidon: list = []             # (in(L,12), states(L,8,12), sbox)
        self._sponges: list = []              # carry-precompute descriptors
        self._select: list = []               # (b, x, y, out) flat lanes
        # (signmask, J) -> [(a(J,L), b(J,L), c(L,), out(L,))]
        self._dot: dict = {}
        # neg(bool) -> [(bit_target, x(L,), y(L,), out(L,))]
        self._csel: dict = {}
        self._nttbf: dict = {}                # inverse -> [(u,v,o1,o2,tw)]
        self._nttbf4: dict = {}               # inverse -> [(8 arrays, tw)]
        # (nbits, logb) -> [(x(L,), limbs(L,nl), bits(L,nb), aux(L,4))]
        self._decomp: dict = {}
        self._built = False

    # ------------------------------------------------------------------ #
    # targets
    # ------------------------------------------------------------------ #

    def add_virtual_targets(self, n: int) -> np.ndarray:
        start = self._num_targets
        self._num_targets += n
        return np.arange(start, start + n, dtype=np.int64)

    def add_virtual_target(self) -> int:
        return int(self.add_virtual_targets(1)[0])

    def add_virtual_public_input(self) -> int:
        t = self.add_virtual_target()
        self.register_public_input(t)
        return t

    def add_virtual_public_inputs(self, n: int) -> np.ndarray:
        ts = self.add_virtual_targets(n)
        self.register_public_inputs(ts)
        return ts

    def add_virtual_bool_target_safe(self) -> int:
        t = self.add_virtual_target()
        self.assert_bool(t)
        return t

    def add_virtual_hash(self) -> np.ndarray:
        return self.add_virtual_targets(HP.HASH_OUT_ELTS)

    def register_public_input(self, t: int) -> None:
        self._pis.append(int(t))

    def register_public_inputs(self, ts) -> None:
        for t in _np_idx(ts):
            self._pis.append(int(t))

    def num_public_inputs(self) -> int:
        return len(self._pis)

    # ------------------------------------------------------------------ #
    # constants
    # ------------------------------------------------------------------ #

    def constant(self, value: int) -> int:
        value = int(value) % gl.P
        if value not in self._const_map:
            t = self.add_virtual_target()
            self._const_map[value] = t
            self._defined.add(t)
        return self._const_map[value]

    def constants(self, values) -> np.ndarray:
        return np.array([self.constant(v) for v in np.asarray(values).ravel()],
                        dtype=np.int64)

    def zero(self) -> int:
        return self.constant(0)

    def one(self) -> int:
        return self.constant(1)

    def neg_one(self) -> int:
        return self.constant(gl.P - 1)

    # ------------------------------------------------------------------ #
    # vectorized core ops
    # ------------------------------------------------------------------ #

    def _arith_vec(self, k0: int, k1: int, a, b, c, out=None) -> np.ndarray:
        """Lanes out = k0*a*b + k1*c. If ``out`` given, it is enforced (its
        cell holds the existing target); else fresh targets are created.
        Accepts any (matching) shapes; the ledger stores flat lanes and the
        returned array carries the input shape."""
        shape = _np_idx(a).shape
        a, b, c = (_np_idx(v).ravel() for v in (a, b, c))
        assert a.shape == b.shape == c.shape
        if out is None:
            out = self.add_virtual_targets(a.size)
            self._defined.update(out.tolist())
            self._ops.append(_WitnessOp("arith", dict(
                k0=k0 % gl.P, k1=k1 % gl.P, a=a, b=b, c=c, out=out)))
        else:
            out = _np_idx(out).ravel()
        key = (k0 % gl.P, k1 % gl.P)
        self._arith_groups.setdefault(key, []).append((a, b, c, out))
        return out.reshape(shape)

    def add_vec(self, x, y) -> np.ndarray:
        one = np.full(_np_idx(x).shape, self.one(), dtype=np.int64)
        return self._arith_vec(1, 1, x, one, y)

    def sub_vec(self, x, y) -> np.ndarray:
        one = np.full(_np_idx(x).shape, self.one(), dtype=np.int64)
        return self._arith_vec(1, gl.P - 1, x, one, y)

    def mul_vec(self, x, y) -> np.ndarray:
        zero = np.full(_np_idx(x).shape, self.zero(), dtype=np.int64)
        return self._arith_vec(1, 0, x, y, zero)

    def mul_add_vec(self, x, y, z) -> np.ndarray:
        """out = x*y + z in one ARITH lane."""
        return self._arith_vec(1, 1, x, y, z)

    def neg_vec(self, x) -> np.ndarray:
        x = _np_idx(x)
        one = np.full(x.shape, self.one(), dtype=np.int64)
        zero = np.full(x.shape, self.zero(), dtype=np.int64)
        return self._arith_vec(gl.P - 1, 0, x, one, zero)

    def mul_const_vec(self, consts, x) -> np.ndarray:
        """Per-lane constant multiply: lowered as mul by constant targets
        (the reference does the same for NTT twiddles, ntt/mod.rs:19-22)."""
        c_ts = self.constants(consts)
        return self.mul_vec(x, np.broadcast_to(c_ts, _np_idx(x).shape))

    def select_vec(self, ctrl, x, y) -> np.ndarray:
        """out = ctrl ? x : y via the dedicated SELECT gate lane
        (constraint ctrl*(x-y) + y - out, degree 2)."""
        x, y = _np_idx(x), _np_idx(y)
        ctrl = np.broadcast_to(_np_idx(ctrl), x.shape)
        out = self.add_virtual_targets(x.size).reshape(x.shape)
        self._defined.update(out.ravel().tolist())
        self._ops.append(_WitnessOp("select", dict(
            b=ctrl.ravel(), x=x.ravel(), y=y.ravel(), out=out.ravel())))
        self._select.append((ctrl.ravel(), x.ravel(), y.ravel(),
                             out.ravel()))
        return out

    def dot_vec(self, lefts, rights, signs=None, c=None) -> np.ndarray:
        """Signed inner-product lanes (the DOT gate): out = sum_j
        s_j * lefts[j] * rights[j] + c with s_j in {+1, -1}. One lane
        per output element — replaces a J-mul + (J-1)-add ARITH chain
        (the reference emits one gate per mul/add, vec_arithmetic.rs:
        49-64). Degree 2."""
        J = len(lefts)
        assert J == len(rights) >= 1
        shape = _np_idx(lefts[0]).shape
        a = np.stack([_np_idx(x).ravel() for x in lefts])     # (J, L)
        bb = np.stack([_np_idx(x).ravel() for x in rights])   # (J, L)
        L = a.shape[1]
        signs = [1] * J if signs is None else list(signs)
        assert len(signs) == J and all(s in (1, -1) for s in signs)
        mask = sum(1 << j for j, s in enumerate(signs) if s < 0)
        cv = np.full(L, self.zero(), dtype=np.int64) if c is None \
            else _np_idx(c).ravel()
        assert cv.shape == (L,)
        out = self.add_virtual_targets(L)
        self._defined.update(out.tolist())
        self._ops.append(_WitnessOp("dot", dict(
            a=a, b=bb, c=cv, out=out, mask=mask)))
        self._dot.setdefault((mask, J), []).append((a, bb, cv, out))
        return out.reshape(shape)

    def csel_vec(self, bit, x, y, neg: bool = False) -> np.ndarray:
        """Shared-control select lanes (the CSEL gate): out = y +
        bit*(s*x - y) with s = -1 when ``neg`` (fused negacyclic-wrap
        rotation select; ref vtfhe/mod.rs:56-66 + glwe_poly.rs:127-142).
        ``bit`` is ONE target shared by the whole call — 3 wires/lane
        (26 lanes/row) vs SELECT's 4 (20/row), and the wrap negation
        costs no extra row."""
        shape = _np_idx(x).shape
        x, y = _np_idx(x).ravel(), _np_idx(y).ravel()
        assert x.shape == y.shape
        bit = int(np.asarray(bit).ravel()[0])
        out = self.add_virtual_targets(x.size)
        self._defined.update(out.tolist())
        self._ops.append(_WitnessOp("csel", dict(
            b=np.array([bit], dtype=np.int64), x=x, y=y, out=out,
            neg=bool(neg))))
        self._csel.setdefault(bool(neg), []).append((bit, x, y, out))
        return out.reshape(shape)

    def assert_bool(self, t) -> None:
        """b*b - b == 0 via an arith lane writing into the zero cell."""
        t = _np_idx(t)
        zero = np.full(t.shape, self.zero(), dtype=np.int64)
        self._arith_vec(1, gl.P - 1, t, t, t, out=zero)

    def split_le_vec(self, x, nbits: int) -> np.ndarray:
        """(L,) targets -> (L, nbits) bit targets, little-endian.

        For ``nbits == 64`` a canonicity constraint is added: the BASESUM
        row only enforces sum(b_i 2^i) == x mod p, so every x < 2^32 - 1
        would otherwise admit a SECOND satisfying bit pattern (that of
        x + p). Downstream consumers read the plain bits (rotation
        amounts in gadgets/ops.py, FRI query indices in
        ivc/verifier_circuit.py), so the alias encoding is a real
        soundness hole — a malicious prover could steer a different
        rotation / open a different Merkle leaf. The non-canonical range
        [p, 2^64) is exactly {hi32 == 0xFFFFFFFF and lo32 >= 1}, so we
        enforce (hi32 == 2^32 - 1) -> lo32 == 0. nbits <= 63 splits are
        injective (max sum < p) and need nothing.

        nbits > 64 (the 65-bit splits of LOGB=5 decomposition,
        ceil(64/5)*5; the reference's plonky2 split_le has the same
        aliasing there) reduces to the 64-bit case by constraining every
        bit above 63 to zero — split inputs are u64 field values, so
        honest witnesses always have them zero, and the only alias for
        65 bits is x+p (x+2p = x + 2^65 + 2 never fits).

        The whole check lives INSIDE the split's own row (BASESUM_CANON:
        wires [s, bits.., lo, hi, u, t1], constraints lo/hi bit-sums,
        (hi-eps)*u == t1, lo*(t1-1) == 0) so it costs ZERO extra rows —
        at paper params a lesum-based gadget pushed the step circuit
        from 2^15 to 2^16 rows, doubling every prover phase."""
        x = _np_idx(x)
        L = x.size
        bits = self.add_virtual_targets(L * nbits).reshape(L, nbits)
        self._defined.update(bits.ravel().tolist())
        if nbits < 64:
            self._ops.append(_WitnessOp("split", dict(x=x, bits=bits)))
            self._basesum.setdefault(nbits, []).append((x, bits))
            return bits
        aux = self.add_virtual_targets(L * 4).reshape(L, 4)
        self._defined.update(aux.ravel().tolist())
        self._ops.append(_WitnessOp("split", dict(x=x, bits=bits, aux=aux)))
        self._basesum_canon.setdefault(nbits, []).append((x, bits, aux))
        return bits

    def ntt_butterfly_vec(self, u, v, twiddles, inverse: bool = False):
        """Fused NTT butterfly lanes with the per-lane twiddle in a
        CONSTANT COLUMN (no twiddle wire, so 20 butterflies/row at
        constraint degree 1 — vs 2 arithmetic lanes per butterfly):

            forward:  (o1, o2) = (u + c*v, u - c*v)
            inverse:  (o1, o2) = (u + v, c*(u - v))

        Returns (o1, o2) target arrays of u's shape."""
        shape = _np_idx(u).shape
        u, v = _np_idx(u).ravel(), _np_idx(v).ravel()
        tw = np.ascontiguousarray(twiddles, dtype=np.uint64).ravel()
        assert u.shape == v.shape == tw.shape
        o1 = self.add_virtual_targets(u.size)
        o2 = self.add_virtual_targets(u.size)
        self._defined.update(o1.tolist())
        self._defined.update(o2.tolist())
        self._ops.append(_WitnessOp("nttbf", dict(
            u=u, v=v, o1=o1, o2=o2, tw=tw, inv=bool(inverse))))
        self._nttbf.setdefault(bool(inverse), []).append((u, v, o1, o2, tw))
        return o1.reshape(shape), o2.reshape(shape)

    def ntt_butterfly4_vec(self, a0, a1, b0, b1, twiddles,
                           inverse: bool = False):
        """Fused RADIX-4 NTT butterfly lanes: two consecutive radix-2
        stages per lane, ONE constant-column twiddle each (the stage
        algebra w = s^2, w_odd = J*s — see NTT_J above), 8 wires/lane
        -> 10 lanes/row, i.e. HALF the rows of the radix-2 NTTBF gate.

            forward  (s = roots[2m+2g]; A,B = even half, C,D = odd):
              o0 = (A + s^2 C) + (sB + s^3 D)
              o1 = (A + s^2 C) - (sB + s^3 D)
              o2 = (A - s^2 C) + J(sB - s^3 D)
              o3 = (A - s^2 C) - J(sB - s^3 D)
            inverse  (s = invroots[2m+2g]):
              o0 = (A+B) + (C+D)
              o1 = s((A-B) + Ji(C-D))
              o2 = s^2((A+B) - (C+D))
              o3 = s^3((A-B) - Ji(C-D))

        Returns (o0, o1, o2, o3) target arrays of a0's shape."""
        shape = _np_idx(a0).shape
        ins = [_np_idx(x).ravel() for x in (a0, a1, b0, b1)]
        tw = np.ascontiguousarray(twiddles, dtype=np.uint64).ravel()
        assert all(x.shape == tw.shape for x in ins)
        outs = [self.add_virtual_targets(tw.size) for _ in range(4)]
        for o in outs:
            self._defined.update(o.tolist())
        self._ops.append(_WitnessOp("nttbf4", dict(
            a0=ins[0], a1=ins[1], b0=ins[2], b1=ins[3],
            o0=outs[0], o1=outs[1], o2=outs[2], o3=outs[3],
            tw=tw, inv=bool(inverse))))
        self._nttbf4.setdefault(bool(inverse), []).append(
            (*ins, *outs, tw))
        return tuple(o.reshape(shape) for o in outs)

    def split_le_limbs_vec(self, xs, logb: int, num_limbs: int):
        """Canonical split + BALANCED limb recombination in ONE row (the
        DECOMP gate): wires [x, balanced(nl), bits(nbits), aux(4)].

        balanced_i = sum_j bits[i*logb+j]*2^j + carry_{i-1} - B*carry_i
        with carry_i = the chunk's top bit — i.e. the whole signed-digit
        carry/balancer chain of glwe_poly.rs:28-50 as nl LINEAR
        constraints in the split's own row (previously: one BASESUM row
        batch for limb sums plus 3 arithmetic lanes per limb for the
        carry chain). Same canonicity constraints as split_le_vec
        (requires nbits >= 64; bits past 63 pinned to zero).
        Returns (bits (L, nbits), balanced (nl, L))."""
        xs = _np_idx(xs)
        L = xs.size
        nbits = num_limbs * logb
        assert nbits >= 64
        bits = self.add_virtual_targets(L * nbits).reshape(L, nbits)
        aux = self.add_virtual_targets(L * 4).reshape(L, 4)
        bal = self.add_virtual_targets(L * num_limbs) \
            .reshape(L, num_limbs)
        self._defined.update(bits.ravel().tolist())
        self._defined.update(aux.ravel().tolist())
        self._defined.update(bal.ravel().tolist())
        self._ops.append(_WitnessOp("splitd", dict(
            x=xs, bits=bits, aux=aux, bal=bal, logb=logb)))
        self._decomp.setdefault((nbits, logb), []).append(
            (xs, bal, bits, aux))
        return bits, bal.T

    def le_sum_vec(self, bits) -> np.ndarray:
        """(L, nbits) bit targets -> (L,) recombined sums."""
        bits = np.asarray(bits, dtype=np.int64)
        out = self.add_virtual_targets(bits.shape[0])
        self._defined.update(out.tolist())
        self._ops.append(_WitnessOp("lesum", dict(bits=bits, out=out)))
        self._basesum.setdefault(bits.shape[1], []).append((out, bits))
        return out

    def poseidon_vec(self, states) -> np.ndarray:
        """(L, 12) state targets -> (L, 12) permuted-state targets.

        Witness targets per permutation: the 8 POS1_KEEP round states
        (L, 8, 12) plus the 22 partial-round sbox outputs (L, 22) — the
        exact wire set of the one-row POS1 gate (nothing else is
        materialized in the witness vector)."""
        states = np.asarray(states, dtype=np.int64)
        L = states.shape[0]
        inter = self.add_virtual_targets(L * 8 * 12).reshape(L, 8, 12)
        sbox = self.add_virtual_targets(L * 22).reshape(L, 22)
        self._defined.update(inter.ravel().tolist())
        self._defined.update(sbox.ravel().tolist())
        self._ops.append(_WitnessOp("poseidon", dict(
            inp=states, states=inter, sbox=sbox)))
        self._poseidon.append((states, inter, sbox))
        out = inter[:, POS1_OUT_IDX, :]
        # ordered precompute descriptor: lets PartialWitness.
        # precompute_sponges chain through standalone permutations (the
        # challenger's empty duplex / partial-chunk absorbs) when their
        # inputs are host-resolvable; skipped otherwise (the jit always
        # recomputes poseidon ops, so skipping is sound)
        self._sponges.append(dict(kind="poseidon", inp=states, out=out))
        return out

    def sponge_vec(self, inputs, init_state=None) -> np.ndarray:
        """Batched overwrite-mode sponge: (L, n) input targets -> (L, 12)
        final-state targets. ``init_state``: optional (L, 12) state targets
        (zeros if None). Full rate-8 chunks are ONE witness op (a lax.scan
        over chunks of L-wide permutations); the partial last chunk (which
        keeps ``state[rem:]`` from the previous permutation, plonky2
        overwrite semantics) is one extra batched permutation.

        This is the shared engine of hash_n_to_hash_no_pad, the in-circuit
        Fiat-Shamir challenger and the recursive verifier's Merkle leaf
        hashing (ref: plonky2 hash_n_to_m_no_pad as used at
        ivc_based_vpbs.rs:128-143)."""
        inputs = np.asarray(inputs, dtype=np.int64)
        assert inputs.ndim == 2
        L, n = inputs.shape
        z = self.zero()
        if init_state is None:
            state = np.full((L, 12), z, dtype=np.int64)
        else:
            state = np.asarray(init_state, dtype=np.int64)
            assert state.shape == (L, 12)
        full = n // 8
        if full:
            chunks = inputs[:, :full * 8].reshape(L, full, 8)
            states = self.add_virtual_targets(L * full * 8 * 12) \
                .reshape(L, full, 8, 12)
            sbox = self.add_virtual_targets(L * full * 22) \
                .reshape(L, full, 22)
            self._defined.update(states.ravel().tolist())
            self._defined.update(sbox.ravel().tolist())
            in_mat = np.empty((L, full, 12), dtype=np.int64)
            in_mat[:, :, :8] = chunks
            in_mat[:, 0, 8:] = state[:, 8:]
            if full > 1:
                in_mat[:, 1:, 8:] = states[:, :-1, POS1_OUT_IDX, 8:12]
            self._ops.append(_WitnessOp("sponge_b", dict(
                chunks=chunks, init=state, states=states, sbox=sbox)))
            # descriptor for host-side carry precompute (see
            # PartialWitness.precompute_sponges): the sequential
            # dependency chain of this absorb is the final-round capacity;
            # ``final`` (the full 12-lane state after the last full chunk)
            # lets CHAINED sponges — the Fiat-Shamir challenger's duplex —
            # resolve their init states host-side too
            self._sponges.append(dict(
                kind="sponge", chunks=chunks, init=state,
                carries=states[:, :, POS1_OUT_IDX, 8:12],
                final=states[:, -1, POS1_OUT_IDX, :]))
            self._poseidon.append((in_mat.reshape(L * full, 12),
                                   states.reshape(L * full, 8, 12),
                                   sbox.reshape(L * full, 22)))
            state = states[:, -1, POS1_OUT_IDX, :].copy()
        rem = n - full * 8
        if rem:
            s_in = state.copy()
            s_in[:, :rem] = inputs[:, full * 8:]
            state = self.poseidon_vec(s_in)
        return state

    def merkle_walk_vec(self, digests, bits, sibs) -> np.ndarray:
        """Batched dynamic-index Merkle path walk: hash ``digests`` (L, 4)
        up ``levels`` levels, steered left/right by ``bits`` (levels, L)
        bool targets against ``sibs`` (levels, L, 4) sibling digests.
        Returns the (L, 4) digests at the top. ONE witness op (lax.scan
        over levels); constraint rows are per-level select lanes + batched
        two_to_one Poseidon rows."""
        digests = np.asarray(digests, dtype=np.int64)
        bits = np.asarray(bits, dtype=np.int64)
        sibs = np.asarray(sibs, dtype=np.int64)
        levels, L = bits.shape
        assert digests.shape == (L, 4) and sibs.shape == (levels, L, 4)
        if levels == 0:
            return digests
        z = self.zero()
        lefts = self.add_virtual_targets(levels * L * 4) \
            .reshape(levels, L, 4)
        rights = self.add_virtual_targets(levels * L * 4) \
            .reshape(levels, L, 4)
        states = self.add_virtual_targets(levels * L * 8 * 12) \
            .reshape(levels, L, 8, 12)
        sbox = self.add_virtual_targets(levels * L * 22) \
            .reshape(levels, L, 22)
        self._defined.update(lefts.ravel().tolist())
        self._defined.update(rights.ravel().tolist())
        self._defined.update(states.ravel().tolist())
        self._defined.update(sbox.ravel().tolist())
        self._ops.append(_WitnessOp("mwalk", dict(
            dig0=digests, bits=bits, sibs=sibs, lefts=lefts, rights=rights,
            states=states, sbox=sbox)))
        cur = digests
        for lvl in range(levels):
            ctrl = np.broadcast_to(bits[lvl][:, None], (L, 4))
            # bit == 1 -> right child: left = sib, right = digest
            self._select.append((ctrl.ravel(), sibs[lvl].ravel(),
                                 cur.ravel(), lefts[lvl].ravel()))
            self._select.append((ctrl.ravel(), cur.ravel(),
                                 sibs[lvl].ravel(), rights[lvl].ravel()))
            in_mat = np.concatenate(
                [lefts[lvl], rights[lvl], np.full((L, 4), z, np.int64)],
                axis=1)
            self._poseidon.append((in_mat, states[lvl], sbox[lvl]))
            cur = states[lvl, :, POS1_OUT_IDX, :4].copy()
        return cur

    def ext_powers_scan(self, x, count: int) -> np.ndarray:
        """[1, x, ..., x^{count-1}] for an extension target x (2,), as a
        (count, 2) target array. ONE witness op (scan); constraints are 4
        vectorized arithmetic-lane groups enforcing p_i = p_{i-1} * x."""
        x = np.asarray(x, dtype=np.int64)
        one2 = np.array([self.one(), self.zero()], dtype=np.int64)
        if count == 1:
            return one2[None, :]
        T = count - 1
        pows = self.add_virtual_targets(T * 2).reshape(T, 2)
        t11 = self.add_virtual_targets(T)
        t01 = self.add_virtual_targets(T)
        self._defined.update(pows.ravel().tolist())
        self._defined.update(t11.tolist())
        self._defined.update(t01.tolist())
        self._ops.append(_WitnessOp("ext_pows", dict(
            x=x, pows=pows, t11=t11, t01=t01)))
        prev = np.concatenate([one2[None, :], pows[:-1]], axis=0)  # (T, 2)
        x0 = np.full(T, x[0], dtype=np.int64)
        x1 = np.full(T, x[1], dtype=np.int64)
        from ..field import extension as _ee
        # t11 = p1 * x1 ; p0' = p0*x0 + W*t11
        self._arith_vec(1, 0, prev[:, 1], x1, np.full(T, self.zero()),
                        out=t11)
        self._arith_vec(1, _ee.W, prev[:, 0], x0, t11, out=pows[:, 0])
        # t01 = p0 * x1 ; p1' = p1*x0 + t01
        self._arith_vec(1, 0, prev[:, 0], x1, np.full(T, self.zero()),
                        out=t01)
        self._arith_vec(1, 1, prev[:, 1], x0, t01, out=pows[:, 1])
        return np.concatenate([one2[None, :], pows], axis=0)

    def ext_horner_scan(self, x, terms) -> np.ndarray:
        """acc = 0; for t in terms: acc = acc*x + t  — over extension
        targets (terms: (T, 2); x: (2,)). Callers pass terms in consumption
        order (i.e. already reversed for a highest-degree-first Horner).
        ONE witness op; vectorized constraint lanes."""
        terms = np.asarray(terms, dtype=np.int64)
        x = np.asarray(x, dtype=np.int64)
        T = terms.shape[0]
        assert terms.shape == (T, 2)
        if T == 1:
            return terms[0]
        S = T - 1
        accs = self.add_virtual_targets(S * 2).reshape(S, 2)
        t11 = self.add_virtual_targets(S)
        t01 = self.add_virtual_targets(S)
        u0 = self.add_virtual_targets(S)
        u1 = self.add_virtual_targets(S)
        for arr in (accs.ravel(), t11, t01, u0, u1):
            self._defined.update(np.asarray(arr).ravel().tolist())
        self._ops.append(_WitnessOp("ext_horner", dict(
            x=x, terms=terms, accs=accs, t11=t11, t01=t01, u0=u0, u1=u1)))
        prev = np.concatenate([terms[0][None, :], accs[:-1]], axis=0)
        x0 = np.full(S, x[0], dtype=np.int64)
        x1 = np.full(S, x[1], dtype=np.int64)
        ones = np.full(S, self.one(), dtype=np.int64)
        zeros = np.full(S, self.zero(), dtype=np.int64)
        from ..field import extension as _ee
        # u0 = a0*x0 + W*t11,  acc0 = u0 + term0
        self._arith_vec(1, 0, prev[:, 1], x1, zeros, out=t11)
        self._arith_vec(1, _ee.W, prev[:, 0], x0, t11, out=u0)
        self._arith_vec(1, 1, u0, ones, terms[1:, 0], out=accs[:, 0])
        # u1 = a1*x0 + t01,  acc1 = u1 + term1
        self._arith_vec(1, 0, prev[:, 0], x1, zeros, out=t01)
        self._arith_vec(1, 1, prev[:, 1], x0, t01, out=u1)
        self._arith_vec(1, 1, u1, ones, terms[1:, 1], out=accs[:, 1])
        return accs[-1]

    def cond_assert_eq_vec(self, cond, xs, ys) -> None:
        """cond * (x - y) == 0 per lane: equality enforced only when the
        bool target ``cond`` is 1 (the recursion base-case gating device —
        replaces plonky2's select-a-dummy-proof approach of
        conditionally_verify_cyclic_proof_or_dummy, ivc_based_vpbs.rs:268)."""
        xs, ys = _np_idx(xs), _np_idx(ys)
        d = self.sub_vec(xs.ravel(), ys.ravel())
        self.cond_assert_zero_vec(cond, d)

    def cond_assert_zero_vec(self, cond, xs) -> None:
        """cond * x == 0 per lane."""
        xs = _np_idx(xs).ravel()
        c = np.full(xs.shape, cond, dtype=np.int64)
        zero = np.full(xs.shape, self.zero(), dtype=np.int64)
        self._arith_vec(1, 0, c, xs, zero, out=zero)

    def is_equal_vec(self, xs, ys) -> np.ndarray:
        """Lane-wise boolean out = (x == y), inverse-witness aux."""
        xs, ys = _np_idx(xs), _np_idx(ys)
        assert xs.shape == ys.shape
        L = xs.size
        out = self.add_virtual_targets(L)
        m = self.add_virtual_targets(L)
        self._defined.update(out.tolist())
        self._defined.update(m.tolist())
        self._ops.append(_WitnessOp("eq", dict(a=xs.ravel(), b=ys.ravel(),
                                               out=out, m=m)))
        diff = self.sub_vec(xs.ravel(), ys.ravel())
        zero = np.full(L, self.zero(), dtype=np.int64)
        one = np.full(L, self.one(), dtype=np.int64)
        # out * diff == 0
        self._arith_vec(1, 0, out, diff, zero, out=zero)
        # m * diff + out == 1
        md = self.mul_vec(m, diff)
        self._arith_vec(1, 1, md, one, out, out=one)
        return out.reshape(xs.shape)

    def connect(self, x: int, y: int) -> None:
        x, y = int(x), int(y)
        self._copies.append((x, y))
        if x in self._defined and y not in self._defined:
            self._defined.add(y)
            self._ops.append(_WitnessOp("copy", dict(src=np.array([x]),
                                                     dst=np.array([y]))))
        elif y in self._defined and x not in self._defined:
            self._defined.add(x)
            self._ops.append(_WitnessOp("copy", dict(src=np.array([y]),
                                                     dst=np.array([x]))))

    def connect_vec(self, xs, ys) -> None:
        for x, y in zip(_np_idx(xs), _np_idx(ys)):
            self.connect(int(x), int(y))

    def connect_hashes(self, xs, ys) -> None:
        """Copy-constrain two 4-target digests (plonky2 connect_hashes,
        used by the reference at ivc_based_vpbs.rs:254-262)."""
        self.connect_vec(xs, ys)

    # ------------------------------------------------------------------ #
    # scalar conveniences (reference builder API surface)
    # ------------------------------------------------------------------ #

    def add(self, x, y):
        return int(self.add_vec([x], [y])[0])

    def sub(self, x, y):
        return int(self.sub_vec([x], [y])[0])

    def mul(self, x, y):
        return int(self.mul_vec([x], [y])[0])

    def mul_add(self, x, y, z):
        return int(self.mul_add_vec([x], [y], [z])[0])

    def neg(self, x):
        return int(self.neg_vec([x])[0])

    def select(self, b, x, y):
        return int(self.select_vec([b], [x], [y])[0])

    def split_le(self, x, nbits: int) -> np.ndarray:
        return self.split_le_vec([x], nbits)[0]

    def le_sum(self, bits) -> int:
        return int(self.le_sum_vec(np.asarray(bits)[None, :])[0])

    def is_equal(self, x: int, y: int) -> int:
        """Boolean target out = (x == y), plonky2-style with an inverse aux."""
        out = self.add_virtual_target()
        m = self.add_virtual_target()
        self._defined.update([out, m])
        self._ops.append(_WitnessOp("eq", dict(a=np.array([x]),
                                               b=np.array([y]),
                                               out=np.array([out]),
                                               m=np.array([m]))))
        diff = self.sub(x, y)
        # out * diff == 0
        self._arith_vec(1, 0, [out], [diff], [self.zero()],
                        out=[self.zero()])
        # m * diff == 1 - out  <=>  m*diff + out == 1
        md = self.mul(m, diff)
        self._arith_vec(1, 1, [md], [self.one()], [out], out=[self.one()])
        return out

    def hash_n_to_hash_no_pad(self, inputs) -> np.ndarray:
        """In-circuit sponge (rate 8, overwrite) -> 4 digest targets.
        Mirrors plonky2's hash_n_to_hash_no_pad used at
        ivc_based_vpbs.rs:128-143.

        All full rate-8 chunks become ONE batched witness op (a
        lax.scan via sponge_vec) — the bsk hash chain alone is ~2k
        sequential permutations at paper params, which must not unroll
        into the witness graph."""
        inputs = _np_idx(inputs)
        if inputs.size == 0:
            return np.full(4, self.zero(), dtype=np.int64)
        return self.sponge_vec(inputs[None, :])[0, :4]

    # ------------------------------------------------------------------ #
    # build
    # ------------------------------------------------------------------ #

    def num_gates(self) -> int:
        rows = 0
        for key, chunks in self._arith_groups.items():
            lanes = sum(c[0].size for c in chunks)
            rows += -(-lanes // ARITH_LANES)
        for nbits, entries in self._basesum.items():
            lanes_pr = max(1, self.config.num_routed_wires // (nbits + 1))
            rows += -(-sum(e[0].size for e in entries) // lanes_pr)
        for nbits, entries in self._basesum_canon.items():
            lanes_pr = max(1, self.config.num_routed_wires // (nbits + 5))
            rows += -(-sum(e[0].size for e in entries) // lanes_pr)
        sel_lanes = sum(s[0].size for s in self._select)
        rows += -(-sel_lanes // SELECT_LANES)
        for (mask, J), entries in self._dot.items():
            lanes_pr = dot_lanes(self.config.num_routed_wires, J)
            rows += -(-sum(e[3].size for e in entries) // lanes_pr)
        for entries in self._csel.values():
            # rows are packed per shared bit — count per bit group
            by_bit: dict = {}
            for bit, x, y, out in entries:
                by_bit[bit] = by_bit.get(bit, 0) + x.size
            rows += sum(-(-n // CSEL_LANES) for n in by_bit.values())
        for entries in self._nttbf.values():
            lanes = sum(e[0].size for e in entries)
            rows += -(-lanes // NTTBF_LANES)
        for entries in self._nttbf4.values():
            lanes = sum(e[0].size for e in entries)
            rows += -(-lanes // NTTBF4_LANES)
        for entries in self._decomp.values():
            rows += sum(e[0].size for e in entries)
        rows += sum(p[0].shape[0] for p in self._poseidon)
        rows += -(-len(self._const_map) // 4)
        rows += 1  # PI gate
        return rows

    def build(self, min_rows: int = 0,
              witness_host: bool = False) -> "CircuitData":
        from .compile import compile_circuit
        assert not self._built
        self._built = True
        return compile_circuit(self, min_rows, witness_host=witness_host)
