"""Native host runtime vs python/jnp reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfhe_tpu import runtime
from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.hashing import poseidon as HP

pytestmark = pytest.mark.skipif(runtime.lib is None,
                                reason="native runtime unavailable")


def test_permute_matches(rng):
    s = rng.integers(0, gl.P, 12, dtype=np.uint64)
    got = runtime.permute(s)
    want = np.asarray(HP.permute_jit(jnp.asarray(s)))
    assert (got == want).all()


def test_hash_no_pad_matches(rng):
    for length in [1, 4, 8, 9, 20, 260]:
        vals = rng.integers(0, gl.P, length, dtype=np.uint64)
        got = runtime.hash_no_pad(vals)
        want = np.asarray(HP.hash_no_pad_jit(jnp.asarray(vals)))
        assert (got == want).all(), length


def test_hash_chain_matches(rng):
    blocks = rng.integers(0, gl.P, (5, 17), dtype=np.uint64)
    got = runtime.hash_chain(blocks)
    h = [0, 0, 0, 0]
    # pure-python chain (bypass the native fast path on purpose)
    p = gl.P
    for b in blocks:
        state = [0] * 12
        vals = h + [int(x) for x in b]
        for start in range(0, len(vals), 8):
            chunk = vals[start:start + 8]
            state[:len(chunk)] = chunk
            state = [int(x) for x in np.asarray(
                HP.permute_jit(jnp.asarray(np.array(state, dtype=np.uint64))))]
        h = state[:4]
    assert [int(x) for x in got] == h


def test_merkle_path_digest(rng):
    from vfhe_tpu.prover import merkle
    leaves = jnp.asarray(rng.integers(0, gl.P, (16, 7), dtype=np.uint64))
    tree = merkle.build(leaves, cap_height=1)
    for idx in [0, 5, 15]:
        leaf, sibs = merkle.open_path(tree, idx)
        assert merkle.verify_path(leaf, idx, sibs, np.asarray(tree.cap))
        # tampered leaf must fail
        bad = leaf.copy()
        bad[0] += 1
        assert not merkle.verify_path(bad, idx, sibs, np.asarray(tree.cap))
