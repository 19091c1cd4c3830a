"""Vectorized Poseidon permutation, sponge hashing, and hash chains.

TPU-native rebuild of plonky2's ``PoseidonHash`` as used by the reference
for Merkle commitments, Fiat-Shamir, and the bsk/LWE hash chains
(ivc_based_vpbs.rs:64-78, 127-146). All entry points are batched over
leading axes: hashing L Merkle leaves is ONE ``(L, 12)``-state
permutation sequence, not L scalar hashes.

Performance note: the MDS layer multiplies by a constant matrix with
< 2^7 entries, so instead of 144 full mulmods per state we split the
state into 32-bit halves, do two small-integer (12x12) matmuls whose
accumulators stay below 2^43 (no overflow), and do a single 128-bit-style
reduction per output element.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from . import constants as C

HASH_OUT_ELTS = 4  # NUM_HASH_OUT_ELTS in plonky2


def _sbox(x: jnp.ndarray) -> jnp.ndarray:
    """x^7 with 4 muls."""
    x2 = gl.mul(x, x)
    x4 = gl.mul(x2, x2)
    return gl.mul(gl.mul(x4, x2), x)


def _mds(state: jnp.ndarray) -> jnp.ndarray:
    """MDS layer out = M @ state over F_q, batched over leading axes.

    M entries are < 2^7; with the state split into 32-bit halves both
    integer accumulators stay < 12 * 127 * 2^32 < 2^43, so we only reduce
    once per output element.
    """
    m = jnp.asarray(C.mds_matrix())  # (12, 12) uint64, small entries
    lo = state & jnp.uint64(0xFFFF_FFFF)
    hi = state >> jnp.uint64(32)
    # out[i] = sum_j M[i, j] * state[..., j]; explicit broadcast + reduce
    # (u64 dot_general is not universally supported, elementwise ops are)
    acc_lo = (m * lo[..., None, :]).sum(axis=-1)
    acc_hi = (m * hi[..., None, :]).sum(axis=-1)
    # value = acc_hi * 2^32 + acc_lo, both < 2^43
    hi64 = acc_hi >> jnp.uint64(32)                      # < 2^11
    lo64 = acc_lo + ((acc_hi & jnp.uint64(0xFFFF_FFFF)) << jnp.uint64(32))
    carry = (lo64 < acc_lo).astype(jnp.uint64)           # 2^64 overflow bit
    return gl._reduce128(hi64 + carry, lo64)


def _round(state: jnp.ndarray, r: int, rc: np.ndarray) -> jnp.ndarray:
    state = gl.add(state, jnp.asarray(rc[r]))
    full = (r < C.HALF_FULL_ROUNDS or
            r >= C.HALF_FULL_ROUNDS + C.N_PARTIAL_ROUNDS)
    if full:
        state = _sbox(state)
    else:
        state = state.at[..., 0].set(_sbox(state[..., 0]))
    return _mds(state)


def permute_unrolled(state: jnp.ndarray) -> jnp.ndarray:
    """Rounds unrolled (~600 HLO): fastest for SEQUENTIAL chains (scan
    bodies over rate chunks), where per-iteration scan overhead dominates
    at (12,)-sized states. Use the scan-based :func:`permute` inside
    functions that inline MANY permutations (tree levels) — huge unrolled
    graphs compile pathologically."""
    rc = C.all_round_constants()
    for r in range(C.N_ROUNDS):
        state = _round(state, r, rc)
    return state


def _scan_phase(state, rcs, partial: bool):
    def body(s, rc):
        s = gl.add(s, rc)
        if partial:
            s = s.at[..., 0].set(_sbox(s[..., 0]))
        else:
            s = _sbox(s)
        out = _mds(s)
        return out, out

    return jax.lax.scan(body, state, rcs)


def permute(state: jnp.ndarray) -> jnp.ndarray:
    """The Poseidon permutation on (..., 12) states (scan-based rounds:
    small shared subgraph for enclosing jits that inline many calls)."""
    rc = jnp.asarray(C.all_round_constants())
    f = C.HALF_FULL_ROUNDS
    p = C.N_PARTIAL_ROUNDS
    state, _ = _scan_phase(state, rc[:f], False)
    state, _ = _scan_phase(state, rc[f:f + p], True)
    state, _ = _scan_phase(state, rc[f + p:], False)
    return state


def permute_all_states(state: jnp.ndarray) -> jnp.ndarray:
    """(..., 12) -> (30, ..., 12): the state after every round (the
    witness layout the Poseidon gates expose). Unrolled: used once inside
    the witness sponge scan body."""
    rc = C.all_round_constants()
    out = []
    for r in range(C.N_ROUNDS):
        state = _round(state, r, rc)
        out.append(state)
    return jnp.stack(out, axis=0)


permute_jit = jax.jit(permute)


def _add_reduce(terms):
    acc = terms[0]
    for t in terms[1:]:
        acc = gl.add(acc, t)
    return acc


def _dense_mul(m: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """out_i = sum_j m[i,j] * y[..., j] with FULL field entries (the
    small-entry accumulator trick of :func:`_mds` does not apply)."""
    prods = gl.mul(m, y[..., None, :])            # (..., 12, 12)
    return _add_reduce([prods[..., j] for j in range(prods.shape[-1])])


def permute_fast(state: jnp.ndarray, unroll: bool = False) -> jnp.ndarray:
    """Bit-identical Poseidon permutation with the optimized partial
    rounds (Poseidon paper App. B / plonky2's fast path): each partial
    round costs one sparse (23-mul) layer instead of a dense MDS.
    Derived from this instance's own constants (constants.
    fast_partial_data) and pinned equal to :func:`permute` by test.

    Used for Merkle trees / transcripts / PoW — any hashing that does
    not need the per-round witness states (Poseidon GATES constrain the
    standard round form, so witness generation keeps permute_all_states
    and the host/C++ mirrors keep the standard rounds as the oracle).
    ``unroll=True`` inlines the rounds (for sequential sponge scan
    bodies, where per-round scan overhead dominates)."""
    rc = jnp.asarray(C.all_round_constants())
    dense, row0, col, dconsts = (jnp.asarray(a)
                                 for a in C.fast_partial_data())
    f = C.HALF_FULL_ROUNDS
    p = C.N_PARTIAL_ROUNDS

    def full_rounds(s, rcs):
        if unroll:
            for i in range(rcs.shape[0]):
                s = _mds(_sbox(gl.add(s, rcs[i])))
            return s
        return _scan_phase(s, rcs, False)[0]

    def sparse_round(s, r0, cl, d):
        s = gl.add(s, d)
        s0 = _sbox(s[..., 0])
        new0 = _add_reduce(
            [gl.mul(r0[0], s0)]
            + [gl.mul(r0[j], s[..., j]) for j in range(1, s.shape[-1])])
        rest = gl.add(s[..., 1:], gl.mul(cl, s0[..., None]))
        return jnp.concatenate([new0[..., None], rest], axis=-1)

    state = full_rounds(state, rc[:f])
    state = _dense_mul(dense, state)
    if unroll:
        for j in range(p):
            state = sparse_round(state, row0[j], col[j], dconsts[j])
    else:
        def body(s, xs):
            return sparse_round(s, *xs), None

        state, _ = jax.lax.scan(body, state, (row0, col, dconsts))
    return full_rounds(state, rc[f + p:])


permute_fast_jit = jax.jit(permute_fast, static_argnums=1)


def hash_no_pad(inputs: jnp.ndarray) -> jnp.ndarray:
    """Sponge hash of (..., L) inputs to (..., 4) digests.

    Overwrite-mode absorption in rate-8 chunks then squeeze 4 elements,
    mirroring plonky2's hash_n_to_m_no_pad (used by the reference via
    hash_n_to_hash_no_pad, ivc_based_vpbs.rs:128). Full chunks absorb
    under ONE lax.scan (long inputs like the public-input vector must not
    unroll hundreds of permutations into the graph).
    """
    inputs = jnp.asarray(inputs, jnp.uint64)
    batch = inputs.shape[:-1]
    length = inputs.shape[-1]
    full = length // C.RATE
    state = jnp.zeros((*batch, C.WIDTH), jnp.uint64)
    if full:
        chunks = inputs[..., :full * C.RATE].reshape(*batch, full, C.RATE)
        chunks = jnp.moveaxis(chunks, -2, 0)          # (full, ..., 8)

        unroll = len(batch) == 0

        def body(s, chunk):
            s = jnp.concatenate([chunk, s[..., C.RATE:]], axis=-1)
            return permute_fast(s, unroll), None

        state, _ = jax.lax.scan(body, state, chunks)
    rem = length - full * C.RATE
    if rem:
        chunk = inputs[..., full * C.RATE:]
        state = jnp.concatenate([chunk, state[..., rem:]], axis=-1)
        state = permute_fast(state)
    return state[..., :HASH_OUT_ELTS]


hash_no_pad_jit = jax.jit(hash_no_pad)


def two_to_one(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Compress two (..., 4) digests into one (plonky2's compress):
    state = [left || right || 0000], permute, take first 4."""
    batch = left.shape[:-1]
    cap = jnp.zeros((*batch, C.WIDTH - 2 * HASH_OUT_ELTS), jnp.uint64)
    state = jnp.concatenate([left, right, cap], axis=-1)
    return permute_fast(state)[..., :HASH_OUT_ELTS]


two_to_one_jit = jax.jit(two_to_one)


def hash_chain(init: jnp.ndarray, blocks: jnp.ndarray) -> jnp.ndarray:
    """h_{i+1} = H(h_i || block_i) over a (T, B) stack of equal blocks.

    Native model of the reference's verify_hash_output iteration
    (ivc_based_vpbs.rs:64-78); used to (re)compute the bsk / LWE-mask
    binding chains.
    """
    def step(h, block):
        return hash_no_pad(jnp.concatenate([h, block], axis=-1)), None

    out, _ = jax.lax.scan(step, init, blocks)
    return out


def zero_digest() -> jnp.ndarray:
    return jnp.zeros(HASH_OUT_ELTS, jnp.uint64)


# ---------------------------------------------------------------------------
# host-side (python int) mirror — used by the verifier / challenger where
# scalar work dominates and per-shape jit compiles would be pure overhead
# ---------------------------------------------------------------------------

def _native():
    # lazy to avoid the hashing<->runtime import cycle
    from .. import runtime
    return runtime if runtime.lib is not None else None


def permute_host(state):
    """Poseidon permutation on a 12-list of python ints (C++ when the
    native runtime is available)."""
    rt = _native()
    if rt is not None:
        return [int(x) for x in rt.permute(state)]
    p = gl.P
    rc = C.all_round_constants()
    mds = C.mds_matrix()
    state = list(state)

    def mds_layer(s):
        return [sum(int(mds[i, j]) * s[j] for j in range(12)) % p
                for i in range(12)]

    r = 0
    for _ in range(C.HALF_FULL_ROUNDS):
        state = [pow((s + int(rc[r][i])) % p, 7, p)
                 for i, s in enumerate(state)]
        state = mds_layer(state)
        r += 1
    for _ in range(C.N_PARTIAL_ROUNDS):
        state = [(s + int(rc[r][i])) % p for i, s in enumerate(state)]
        state[0] = pow(state[0], 7, p)
        state = mds_layer(state)
        r += 1
    for _ in range(C.HALF_FULL_ROUNDS):
        state = [pow((s + int(rc[r][i])) % p, 7, p)
                 for i, s in enumerate(state)]
        state = mds_layer(state)
        r += 1
    return state


def hash_no_pad_host(inputs) -> list:
    """Host mirror of :func:`hash_no_pad` -> 4-list of ints."""
    rt = _native()
    if rt is not None:
        import numpy as _np
        return [int(x) for x in rt.hash_no_pad(
            _np.array([int(v) for v in inputs], dtype=_np.uint64))]
    vals = [int(x) for x in inputs]
    state = [0] * C.WIDTH
    for start in range(0, len(vals), C.RATE):
        chunk = vals[start:start + C.RATE]
        state[:len(chunk)] = chunk
        state = permute_host(state)
    return state[:HASH_OUT_ELTS]


def two_to_one_host(left, right) -> list:
    state = [int(x) for x in left] + [int(x) for x in right] + [0, 0, 0, 0]
    return permute_host(state)[:HASH_OUT_ELTS]
