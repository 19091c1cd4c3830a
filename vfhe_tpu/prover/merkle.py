"""Poseidon Merkle trees with caps, batched level-wise.

Rebuild of plonky2's ``MerkleTree``/``MerkleCap`` (the commitment layer
under every FRI oracle the reference's prover uses). TPU-first: leaf
hashing is ONE batched sponge over the (L, row_width) leaf matrix, and
each tree level is one batched two_to_one compression — level-wise
reduction as in SURVEY.md section 5's scaling notes.

A tree over L leaves stops at 2^cap_height digests (the "cap"), which is
what gets observed by the challenger / checked by the verifier.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..hashing import poseidon as H


@dataclass
class MerkleTree:
    leaf_data: jnp.ndarray        # (L, W) field elements
    levels: list                  # levels[0] = leaf digests (L, 4), ... cap last
    cap_height: int

    @property
    def cap(self) -> jnp.ndarray:
        return self.levels[-1]


import functools
import jax


@functools.partial(jax.jit, static_argnums=(1,))
def _tree_levels(leaves: jnp.ndarray, cap_height: int):
    """Leaf hashing + every compression level in ONE compiled function
    (one jit per leaf shape instead of one per level — each separate
    compile costs minutes over the remote-compile tunnel)."""
    levels = [H.hash_no_pad(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(H.two_to_one(cur[0::2], cur[1::2]))
    return tuple(levels)


def build(leaf_data: jnp.ndarray, cap_height: int = 4) -> MerkleTree:
    leaves = jnp.asarray(leaf_data, jnp.uint64)
    n = leaves.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    cap_height = min(cap_height, int(np.log2(n)))
    levels = list(_tree_levels(leaves, cap_height))
    return MerkleTree(leaf_data=leaves, levels=levels, cap_height=cap_height)


def open_path(tree: MerkleTree, index: int):
    """(leaf_row, siblings) where siblings has one digest per level below
    the cap."""
    sibs = []
    idx = index
    for level in tree.levels[:-1]:
        sibs.append(np.asarray(level[idx ^ 1]))
        idx >>= 1
    return np.asarray(tree.leaf_data[index]), sibs


def open_paths_gather(tree: MerkleTree, indices) -> list:
    """Stage the device gathers for many path openings (leaf rows + one
    sibling per level). Returns a list of device arrays; combine several
    trees' gathers into ONE ``jax.device_get`` — per-tree transfers cost
    a full tunnel round-trip (~40 ms) each."""
    import jax.numpy as jnp
    idxs = np.asarray(indices, dtype=np.int64)
    fetch = [tree.leaf_data[jnp.asarray(idxs)]]
    cur = idxs.copy()
    for level in tree.levels[:-1]:
        fetch.append(level[jnp.asarray(cur ^ 1)])
        cur >>= 1
    return fetch


def open_paths_finish(host: list, indices) -> list:
    """Pair ``jax.device_get``-ed gathers back into [(leaf_row,
    siblings)] per index."""
    idxs = np.asarray(indices, dtype=np.int64)
    rows, sib_levels = host[0], host[1:]
    return [(rows[qi], [lvl[qi] for lvl in sib_levels])
            for qi in range(len(idxs))]


def open_paths_bulk(tree: MerkleTree, indices):
    """Open many paths with ONE device->host transfer for the tree."""
    import jax
    host = jax.device_get(open_paths_gather(tree, indices))
    return open_paths_finish(host, indices)


def verify_path(leaf_row, index: int, siblings, cap) -> bool:
    """Host-side path check against the cap (used by the proof verifier;
    native/python-int Poseidon — scalar work, no device round-trips)."""
    from .. import runtime
    if runtime.lib is not None and len(siblings):
        digest = runtime.merkle_path_digest(
            np.asarray(leaf_row, dtype=np.uint64),
            np.asarray(siblings, dtype=np.uint64), index)
        idx = index >> len(siblings)
        return (np.asarray(cap[idx], dtype=np.uint64) == digest).all()
    digest = H.hash_no_pad_host(np.asarray(leaf_row, dtype=np.uint64))
    idx = index
    for sib in siblings:
        sib = [int(x) for x in sib]
        l, r = (sib, digest) if idx & 1 else (digest, sib)
        digest = H.two_to_one_host(l, r)
        idx >>= 1
    return [int(x) for x in np.asarray(cap[idx])] == digest
