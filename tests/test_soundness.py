"""Malicious-witness soundness tests.

The round-1 suite proved tampered PROOFS are rejected; these tests forge
the WITNESS instead: run honest witness generation, overwrite selected
targets with adversarial values (keeping every other constraint
satisfiable where the attack calls for it), produce a real proof from
the forged witness, and require verification to fail.

Covers the constraint-set edges the reference inherits from plonky2
gates and VERDICT round 1 flagged as unreviewed:
  * BaseSum booleanness + recombination (plonky2 BaseSumGate<2>,
    as relied on by glwe_poly.rs:28-50),
  * the 64-bit split canonicity hole (x vs x+p alias encodings) now
    closed by CircuitBuilder.split_le_vec's canonicity constraint,
  * select-control booleanness,
  * is_equal's inverse-witness constraints,
  * Poseidon round constraints (forged sponge intermediate states and
    forged precomputed sponge carries),
  * copy (permutation-argument) constraints,
  * arithmetic-gate outputs.
"""

import dataclasses

# every forging test proves a real (if tiny) circuit: minutes in sum
pytestmark = __import__("pytest").mark.heavy

import numpy as np
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.prover import prove, preprocess, verify, VerificationError


def _forge_and_expect_reject(data, pw, tamper: dict):
    """Prove with the honest witness overwritten at ``tamper`` targets;
    the resulting proof must fail verification."""
    pre = preprocess(data)
    w = np.asarray(
        data.witness_fn(jnp.asarray(pw.initial_vector(data)))).copy()
    for t, v in tamper.items():
        w[int(t)] = int(v) % gl.P
    wj = jnp.asarray(w)
    forged = dataclasses.replace(data, witness_fn=lambda w0: wj)
    proof = prove(forged, pw)
    with pytest.raises(VerificationError):
        verify(pre["vk"], proof)


# --------------------------------------------------------------------- #
# 64-bit split: booleanness, recombination, canonicity
# --------------------------------------------------------------------- #

X_VAL = 12345


@pytest.fixture(scope="module")
def split64():
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    b.register_public_input(x)
    n_ops = len(b._ops)
    bits = b.split_le(x, 64)
    split_ops = b._ops[n_ops:]
    assert [op.kind for op in split_ops] == ["split"]
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, X_VAL)
    return data, pw, bits, split_ops


def test_forged_nonboolean_bit(split64):
    data, pw, bits, _ = split64
    # bit0 of 12345 is 1; claim it is 2 (breaks b*(b-1) == 0)
    _forge_and_expect_reject(data, pw, {bits[0]: 2})


def test_forged_decomposition_bit_flip(split64):
    data, pw, bits, _ = split64
    # flip a zero bit to one (still boolean; recombination sum breaks)
    assert (X_VAL >> 20) & 1 == 0
    _forge_and_expect_reject(data, pw, {bits[20]: 1})


def test_noncanonical_u64_encoding_rejected(split64):
    """The alias encoding: bits of X_VAL + p recombine to X_VAL mod p and
    are all boolean, so WITHOUT the canonicity constraints this witness
    would satisfy the basesum rows while presenting completely different
    plain bits (the attack surface: rotation amounts, FRI query
    indices). The BASESUM_CANON row's aux wires [lo, hi, u, t1] are set
    consistently with the alias bits, so the canonicity row
    lo*(t1-1) == 0 is the only unsatisfied constraint."""
    data, pw, bits, split_ops = split64
    alias = X_VAL + gl.P                      # < 2^64
    assert alias < 2**64
    tamper = {int(bits[i]): (alias >> i) & 1 for i in range(64)}
    aux = split_ops[0].data["aux"][0]         # [lo, hi, u, t1]
    lo_val = alias & 0xFFFFFFFF
    hi_val = alias >> 32
    assert hi_val == 2**32 - 1 and lo_val == X_VAL + 1
    # hi == eps => (hi-eps)*u == t1 forces t1 = 0 for any u
    tamper.update({int(aux[0]): lo_val, int(aux[1]): hi_val,
                   int(aux[2]): 0, int(aux[3]): 0})
    # the only violated row is lo * (t1 - 1) == 0
    _forge_and_expect_reject(data, pw, tamper)


def test_noncanonical_65bit_encoding_rejected():
    """65-bit splits (LOGB=5 decomposition, ceil(64/5)*5 bits — same
    shape as plonky2's split_le there) admit exactly one alias, x+p,
    which sets bit 64. The aux wires are set consistently with the
    alias bits, so the pinned-zero row for bit 64 is the only
    unsatisfied constraint."""
    x_val = 1 << 40
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    b.register_public_input(x)
    n_ops = len(b._ops)
    bits = b.split_le(x, 65)
    split_ops = b._ops[n_ops:]
    assert [op.kind for op in split_ops] == ["split"]
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, x_val)

    alias = x_val + gl.P
    assert alias < 2**65 and (alias >> 64) & 1 == 1
    tamper = {int(bits[i]): (alias >> i) & 1 for i in range(65)}
    lo_val = alias & 0xFFFFFFFF
    hi_val = (alias >> 32) & 0xFFFFFFFF
    assert hi_val != 2**32 - 1
    aux = split_ops[0].data["aux"][0]
    d = (hi_val - (2**32 - 1)) % gl.P
    tamper.update({int(aux[0]): lo_val, int(aux[1]): hi_val,
                   int(aux[2]): pow(d, gl.P - 2, gl.P), int(aux[3]): 1})
    _forge_and_expect_reject(data, pw, tamper)


# --------------------------------------------------------------------- #
# select control booleanness
# --------------------------------------------------------------------- #

def test_forged_select_control_nonboolean():
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_inputs([x, y])
    ctrl = b.add_virtual_bool_target_safe()
    out = b.select(ctrl, x, y)
    data = b.build()
    pw = PartialWitness()
    xv, yv = 11, 22
    pw.set_target(x, xv)
    pw.set_target(y, yv)
    pw.set_target(ctrl, 1)
    # ctrl = 2 with out = 2*(x-y) + y keeps the select row satisfied;
    # only booleanness breaks
    _forge_and_expect_reject(data, pw, {
        ctrl: 2, out: (2 * (xv - yv) + yv) % gl.P})


# --------------------------------------------------------------------- #
# is_equal inverse witness
# --------------------------------------------------------------------- #

def test_forged_is_equal_claims_equality():
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_inputs([x, y])
    eqt = b.is_equal(x, y)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 7)
    # x != y but the prover claims out = 1: out*diff == 0 breaks
    _forge_and_expect_reject(data, pw, {eqt: 1})


# --------------------------------------------------------------------- #
# Poseidon round constraints
# --------------------------------------------------------------------- #

def test_forged_sponge_intermediate_state():
    b = CircuitBuilder(TEST_CONFIG)
    xs = b.add_virtual_targets(4)
    b.register_public_inputs(xs)
    b.hash_n_to_hash_no_pad(xs)           # one permutation (partial chunk)
    # the poseidon witness op holds the POS1 wire targets: the 8 kept
    # round states (L, 8, 12) and the 22 partial-round sbox outs (L, 22)
    pos_ops = [op for op in b._ops if op.kind == "poseidon"]
    assert pos_ops
    states = pos_ops[0].data["states"]
    sbox = pos_ops[0].data["sbox"]
    data = b.build()
    pw = PartialWitness()
    pw.set_target_arr(xs, np.arange(1, 5, dtype=np.uint64))
    honest = np.asarray(
        data.witness_fn(jnp.asarray(pw.initial_vector(data))))
    # corrupt a middle full-round state element
    t = int(states[0, 2, 3])
    _forge_and_expect_reject(data, pw, {t: (int(honest[t]) + 1) % gl.P})
    # corrupt a partial-round sbox output
    t2 = int(sbox[0, 10])
    _forge_and_expect_reject(data, pw, {t2: (int(honest[t2]) + 1) % gl.P})


def test_forged_precomputed_sponge_carry():
    """witness_fn_pre trusts the carries handed to it; a wrong carry must
    yield an unsatisfiable witness, not a wrong-but-accepted proof."""
    b = CircuitBuilder(TEST_CONFIG)
    xs = b.add_virtual_targets(16)        # two full rate-8 chunks
    b.register_public_inputs(xs)
    hh = b.hash_n_to_hash_no_pad(xs)
    b.register_public_inputs(hh)
    data = b.build()
    assert data.sponges
    pw = PartialWitness()
    vals = np.arange(1, 17, dtype=np.uint64)
    pw.set_target_arr(xs, vals)
    from vfhe_tpu.hashing import poseidon as HP
    digest = HP.hash_no_pad_host([int(v) for v in vals])
    pw.set_target_arr(hh, np.array(digest, np.uint64))
    pw.precompute_sponges(data)
    assert pw.sponges_precomputed
    # corrupt one precomputed carry lane (later set_target wins)
    carry_t = int(data.sponges[0]["carries"][0, 0, 0])
    pre = preprocess(data)
    w0 = pw.initial_vector(data)
    pw.set_target(carry_t, (int(w0[carry_t]) + 1) % gl.P)
    proof = prove(data, pw)
    with pytest.raises(VerificationError):
        verify(pre["vk"], proof)


# --------------------------------------------------------------------- #
# copy constraints and arithmetic outputs
# --------------------------------------------------------------------- #

def test_forged_copy_constraint():
    b = CircuitBuilder(TEST_CONFIG)
    u = b.add_virtual_target()
    b.register_public_input(u)
    v = b.add_virtual_target()
    b.connect(u, v)                       # v copies u
    z = b.add(v, b.one())                 # v occupies a routed cell
    z2 = b.add(u, b.one())                # u occupies a routed cell
    data = b.build()
    pw = PartialWitness()
    pw.set_target(u, 9)
    # v = u + 5 with its arithmetic row kept consistent: only the
    # sigma/permutation argument breaks
    _forge_and_expect_reject(data, pw, {v: 14, z: 15})
    del z2


def test_forged_arithmetic_output():
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_inputs([x, y])
    z = b.mul(x, y)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 6)
    pw.set_target(y, 7)
    _forge_and_expect_reject(data, pw, {z: 43})


# --------------------------------------------------------------------- #
# Round-3 packing gates: DOT, CSEL, NTTBF4 — the security-critical
# lanes of the packed step circuit (the whole external product flows
# through DOT, gadgets/ggsw_ct.py:51-80; the whole rotation barrel
# through CSEL, gadgets/ops.py:30-58; every NTT stage through NTTBF4,
# gadgets/ntt_gadget.py). Ref paths: ggsw_ct.rs:98-112, vtfhe/mod.rs:
# 80-107, ntt/mod.rs:12-70.
# --------------------------------------------------------------------- #


def test_forged_dot_lane_sign_flip():
    """out = x1*y1 - x2*y2 (signed DOT lane); claim the +,+ value."""
    b = CircuitBuilder(TEST_CONFIG)
    x1, x2 = b.add_virtual_target(), b.add_virtual_target()
    y1, y2 = b.add_virtual_target(), b.add_virtual_target()
    b.register_public_inputs([x1, x2, y1, y2])
    out = b.dot_vec([x1, x2], [y1, y2], signs=[1, -1])
    data = b.build()
    pw = PartialWitness()
    vals = {x1: 6, x2: 7, y1: 11, y2: 13}
    for t, v in vals.items():
        pw.set_target(t, v)
    honest = (6 * 11 - 7 * 13) % gl.P
    forged = (6 * 11 + 7 * 13) % gl.P
    assert honest != forged
    _forge_and_expect_reject(data, pw, {int(out.ravel()[0]): forged})


def test_forged_csel_fused_negation():
    """CSEL with neg=True (the negacyclic-wrap rotation select):
    bit=1 must yield -x; forging the NON-negated select value +x —
    exactly the wrap-sign attack on the rotation barrel — must be
    rejected."""
    b = CircuitBuilder(TEST_CONFIG)
    bit = b.add_virtual_target()
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_inputs([bit, x, y])
    b.assert_bool(bit)
    out = b.csel_vec(bit, [x], [y], neg=True)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(bit, 1)
    pw.set_target(x, 12345)
    pw.set_target(y, 777)
    # honest: -x mod p; forged: +x (what a plain select would give)
    _forge_and_expect_reject(data, pw, {int(out.ravel()[0]): 12345})


def test_forged_csel_plain_output():
    """CSEL without negation: bit=0 must pass y through; forge x."""
    b = CircuitBuilder(TEST_CONFIG)
    bit = b.add_virtual_target()
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_inputs([bit, x, y])
    b.assert_bool(bit)
    out = b.csel_vec(bit, [x], [y], neg=False)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(bit, 0)
    pw.set_target(x, 12345)
    pw.set_target(y, 777)
    _forge_and_expect_reject(data, pw, {int(out.ravel()[0]): 12345})


def test_forged_nttbf4_output_limb():
    """Radix-4 NTT butterfly lane: forge one of the four outputs."""
    from vfhe_tpu.ntt.params import get_params
    p8 = get_params(8)
    b = CircuitBuilder(TEST_CONFIG)
    ins = [b.add_virtual_target() for _ in range(4)]
    b.register_public_inputs(ins)
    tw = np.array([p8.roots[2]], dtype=np.uint64)   # a real stage twiddle
    o0, o1, o2, o3 = b.ntt_butterfly4_vec([ins[0]], [ins[1]], [ins[2]],
                                          [ins[3]], tw)
    data = b.build()
    pw = PartialWitness()
    for t, v in zip(ins, (3, 1, 4, 1)):
        pw.set_target(t, v)
    # honest o1 = (A + s^2 C) - (sB + s^3 D); nudge it by 1
    s = int(tw[0])
    A, B, C, D = 3, 1, 4, 1
    honest = (gl.h_mul(1, A + gl.h_mul(gl.h_mul(s, s), C))
              - (gl.h_mul(s, B) + gl.h_mul(gl.h_mul(gl.h_mul(s, s), s), D))
              ) % gl.P
    _forge_and_expect_reject(data, pw,
                             {int(o1.ravel()[0]): (honest + 1) % gl.P})


def test_forged_nttbf4_inverse_output():
    """Inverse radix-4 lane: forge o2 (= s^2((A+B) - (C+D)))."""
    from vfhe_tpu.ntt.params import get_params
    p8 = get_params(8)
    b = CircuitBuilder(TEST_CONFIG)
    ins = [b.add_virtual_target() for _ in range(4)]
    b.register_public_inputs(ins)
    tw = np.array([p8.invroots[2]], dtype=np.uint64)
    o0, o1, o2, o3 = b.ntt_butterfly4_vec([ins[0]], [ins[1]], [ins[2]],
                                          [ins[3]], tw, inverse=True)
    data = b.build()
    pw = PartialWitness()
    for t, v in zip(ins, (3, 1, 4, 1)):
        pw.set_target(t, v)
    s = int(tw[0])
    honest = gl.h_mul(gl.h_mul(s, s), ((3 + 1) - (4 + 1)) % gl.P)
    _forge_and_expect_reject(data, pw,
                             {int(o2.ravel()[0]): (honest + 1) % gl.P})
