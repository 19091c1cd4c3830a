"""Poseidon permutation / sponge tests.

The permutation is checked against an independent pure-python-int model
(same constants), so a vectorization bug in the jnp path cannot hide; the
sponge and chain layers are checked for shape/semantics (rate-8 overwrite
absorption, plonky2-style) and batching consistency.
"""

import numpy as np
import jax.numpy as jnp

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.hashing import constants as C
from vfhe_tpu.hashing import poseidon as H

P = gl.P


def _py_mds(state):
    m = C.mds_matrix()
    return [sum(int(m[i, j]) * state[j] for j in range(12)) % P
            for i in range(12)]


def _py_permute(state):
    rc = C.all_round_constants()
    state = list(state)
    r = 0
    def sbox(x): return pow(x, 7, P)
    for _ in range(C.HALF_FULL_ROUNDS):
        state = [(s + int(rc[r][i])) % P for i, s in enumerate(state)]
        state = [sbox(s) for s in state]
        state = _py_mds(state)
        r += 1
    for _ in range(C.N_PARTIAL_ROUNDS):
        state = [(s + int(rc[r][i])) % P for i, s in enumerate(state)]
        state[0] = sbox(state[0])
        state = _py_mds(state)
        r += 1
    for _ in range(C.HALF_FULL_ROUNDS):
        state = [(s + int(rc[r][i])) % P for i, s in enumerate(state)]
        state = [sbox(s) for s in state]
        state = _py_mds(state)
        r += 1
    return state


def test_constants_sane():
    rc = C.all_round_constants()
    assert rc.shape == (30, 12)
    assert (rc.astype(object) < P).all()
    # deterministic across calls
    assert (rc == C.all_round_constants()).all()
    # no obviously degenerate values
    assert len(set(rc.flatten().tolist())) == 360


def test_permute_matches_python_model(rng):
    states = rng.integers(0, P, (3, 12), dtype=np.uint64)
    got = np.asarray(H.permute_jit(jnp.asarray(states)))
    for s_in, s_out in zip(states, got):
        want = _py_permute([int(x) for x in s_in])
        assert [int(x) for x in s_out] == want


def test_permute_fast_bit_identical(rng):
    """The optimized partial-round form (sparse per-round matrices,
    constants.fast_partial_data) must be bit-identical to the standard
    rounds in both scan and unrolled lowering — it backs all Merkle /
    transcript / PoW hashing."""
    states = rng.integers(0, P, (64, 12), dtype=np.uint64)
    want = np.asarray(H.permute_jit(jnp.asarray(states)))
    got_scan = np.asarray(H.permute_fast(jnp.asarray(states)))
    got_unrl = np.asarray(H.permute_fast(jnp.asarray(states), True))
    assert (got_scan == want).all()
    assert (got_unrl == want).all()
    # scalar (unbatched) state as used in sequential sponge bodies
    one = np.asarray(H.permute_fast(jnp.asarray(states[0]), True))
    assert (one == want[0]).all()


def test_permute_batched_consistent(rng):
    states = rng.integers(0, P, (4, 5, 12), dtype=np.uint64)
    full = np.asarray(H.permute_jit(jnp.asarray(states)))
    one = np.asarray(H.permute_jit(jnp.asarray(states[2, 3])))
    assert (full[2, 3] == one).all()


def test_hash_no_pad_absorption(rng):
    # 10 inputs = one full rate-8 chunk + one 2-element chunk (overwrite mode)
    inputs = rng.integers(0, P, 10, dtype=np.uint64)
    got = np.asarray(H.hash_no_pad_jit(jnp.asarray(inputs)))

    state = [0] * 12
    state[:8] = [int(x) for x in inputs[:8]]
    state = _py_permute(state)
    state[:2] = [int(x) for x in inputs[8:]]
    state = _py_permute(state)
    assert [int(x) for x in got] == state[:4]


def test_two_to_one(rng):
    l = rng.integers(0, P, 4, dtype=np.uint64)
    r = rng.integers(0, P, 4, dtype=np.uint64)
    got = np.asarray(H.two_to_one_jit(jnp.asarray(l), jnp.asarray(r)))
    state = [int(x) for x in l] + [int(x) for x in r] + [0] * 4
    want = _py_permute(state)[:4]
    assert [int(x) for x in got] == want


def test_hash_chain(rng):
    blocks = jnp.asarray(rng.integers(0, P, (3, 5), dtype=np.uint64))
    got = np.asarray(H.hash_chain(H.zero_digest(), blocks))
    h = np.zeros(4, dtype=np.uint64)
    for b in np.asarray(blocks):
        h = np.asarray(H.hash_no_pad_jit(jnp.asarray(
            np.concatenate([h, b]))))
    assert (got == h).all()


# --------------------------------------------------------------------- #
# committed golden vectors (tests/golden_poseidon.py): pin THIS instance
# so any drift of the Grain table / MDS / round structure / sponge
# semantics is a failure (the plonky2-parity gap is documented there and
# in README "Poseidon instance")
# --------------------------------------------------------------------- #

import golden_poseidon as GP


def test_golden_permute_vectors():
    for s_in, want in GP.PERMUTE:
        got_jnp = np.asarray(H.permute_jit(jnp.asarray(
            np.array(s_in, dtype=np.uint64))))
        assert [int(x) for x in got_jnp] == [w % P for w in want]
        assert H.permute_host(list(s_in)) == [w % P for w in want]


def test_golden_sponge_vectors():
    for n, want in GP.HASH_NO_PAD:
        inp = np.arange(1, n + 1, dtype=np.uint64)
        got = np.asarray(H.hash_no_pad_jit(jnp.asarray(inp)))
        assert [int(x) for x in got] == want
        assert H.hash_no_pad_host(inp.tolist()) == want


def test_golden_two_to_one_and_chain():
    l = H.hash_no_pad_host([1, 2, 3, 4])
    r = H.hash_no_pad_host([5, 6, 7, 8])
    assert H.two_to_one_host(l, r) == GP.TWO_TO_ONE
    h = [0, 0, 0, 0]
    for i in range(3):
        h = H.hash_no_pad_host(h + [10 * i + k for k in range(5)])
    assert h == GP.HASH_CHAIN3


def test_plonky2_parity_when_table_installed():
    """Activates when a plonky2 constant table is dropped in (a JSON file
    ``plonky2_poseidon.json`` at the repo root with keys
    ``all_round_constants`` (360 u64, round-major) and ``vectors``
    (list of [state12_in, state12_out] u64 pairs from plonky2's own
    test_vectors). Until then the structural preconditions are checked
    and the test is skipped."""
    import json
    import pathlib
    import pytest

    path = pathlib.Path(__file__).resolve().parent.parent / \
        "plonky2_poseidon.json"
    if not path.exists():
        pytest.skip("no plonky2 constant table available in this "
                    "environment (zero egress); parity unverifiable")
    spec = json.loads(path.read_text())
    C.set_round_constants(spec["all_round_constants"])
    try:
        for s_in, want in spec["vectors"]:
            got = H.permute_host([int(x) for x in s_in])
            assert got == [int(x) % P for x in want]
    finally:
        C._round_constants_override = None
        C.all_round_constants.cache_clear()
