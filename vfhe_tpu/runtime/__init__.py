"""Native host runtime bindings (C++ via ctypes, python fallback).

Builds host_crypto.cc on first import (cached .so next to the source) and
exposes the scalar Poseidon/Merkle kernels the verifier's hot host paths
need. If the toolchain is unavailable, ``lib`` is None and callers fall
back to the pure-python implementations in vfhe_tpu.hashing.poseidon.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("vfhe_tpu")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_crypto.cc")
_SO = os.path.join(_DIR, "host_crypto.so")

lib = None


def _build() -> str | None:
    if (os.path.exists(_SO) and
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception as e:  # no toolchain / sandbox: fall back to python
        log.warning("native host runtime unavailable (%s); python fallback",
                    e)
        return None


def reload_constants() -> None:
    """Re-inject the Poseidon tables (after set_round_constants)."""
    if lib is not None:
        _inject_tables(lib)


def _inject_tables(L) -> None:
    u64p = ctypes.POINTER(ctypes.c_uint64)
    from ..hashing import constants as HC
    rc = np.ascontiguousarray(HC.all_round_constants(), dtype=np.uint64)
    mds = np.ascontiguousarray(HC.mds_matrix(), dtype=np.uint64)
    L.set_poseidon_constants(rc.ctypes.data_as(u64p),
                             mds.ctypes.data_as(u64p))
    # optimized partial-round tables (bit-identical fast path, ~2.5x
    # fewer scalar muls) — derived from the SAME constants, so they
    # cannot drift from the device kernels
    dense, row0, col, consts = (
        np.ascontiguousarray(a, dtype=np.uint64)
        for a in HC.fast_partial_data())
    L.set_poseidon_fast_partial(dense.ctypes.data_as(u64p),
                                row0.ctypes.data_as(u64p),
                                col.ctypes.data_as(u64p),
                                consts.ctypes.data_as(u64p))


def _load():
    global lib
    so = _build()
    if so is None:
        return
    L = ctypes.CDLL(so)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    L.set_poseidon_constants.argtypes = [u64p, u64p]
    L.poseidon_permute.argtypes = [u64p]
    L.hash_no_pad.argtypes = [u64p, ctypes.c_uint64, u64p]
    L.hash_chain.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64, u64p]
    L.sponge_carries.argtypes = [u64p, ctypes.c_uint64, u64p, u64p]
    L.two_to_one.argtypes = [u64p, u64p, u64p]
    L.merkle_path_digest.argtypes = [u64p, ctypes.c_uint64, u64p,
                                     ctypes.c_uint64, ctypes.c_uint64, u64p]

    L.set_poseidon_fast_partial.argtypes = [u64p, u64p, u64p, u64p]
    # batch (thread-parallel) entry points for the batched verifier
    L.poseidon_permute_batch.argtypes = [u64p, ctypes.c_uint64]
    L.hash_no_pad_batch.argtypes = [u64p, ctypes.c_uint64,
                                    ctypes.c_uint64, u64p]
    L.merkle_paths_batch.argtypes = [u64p, ctypes.c_uint64, u64p,
                                     ctypes.c_uint64, u64p,
                                     ctypes.c_uint64, u64p]
    L.hash_chain_batch.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64,
                                   ctypes.c_uint64, u64p]

    _inject_tables(L)
    lib = L


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def hash_no_pad(values) -> np.ndarray:
    vals = np.ascontiguousarray(values, dtype=np.uint64).ravel()
    out = np.zeros(4, dtype=np.uint64)
    lib.hash_no_pad(_ptr(vals), len(vals), _ptr(out))
    return out


def hash_chain(blocks: np.ndarray, init=None) -> np.ndarray:
    """blocks: (n_blocks, block_len) -> final 4-element digest."""
    blocks = np.ascontiguousarray(blocks, dtype=np.uint64)
    state = np.zeros(4, dtype=np.uint64) if init is None else \
        np.ascontiguousarray(init, dtype=np.uint64).copy()
    lib.hash_chain(_ptr(blocks), blocks.shape[0], blocks.shape[1],
                   _ptr(state))
    return state


def merkle_path_digest(leaf, siblings, index: int) -> np.ndarray:
    leaf = np.ascontiguousarray(leaf, dtype=np.uint64).ravel()
    sibs = np.ascontiguousarray(siblings, dtype=np.uint64).reshape(-1, 4)
    out = np.zeros(4, dtype=np.uint64)
    lib.merkle_path_digest(_ptr(leaf), len(leaf), _ptr(sibs), sibs.shape[0],
                           index, _ptr(out))
    return out


def sponge_carries(chunks: np.ndarray, init_state=None):
    """Absorb (C, 8) full chunks overwrite-mode from ``init_state`` (12,),
    returning ``(carries, final)``: the (C, 4) capacity lanes after each
    permutation — the sequential dependency chain of a long sponge — and
    the final full 12-lane state (the C++ kernel leaves it in its in-out
    state arg). Precomputed natively so the jitted witness generator can
    batch the permutations, and so chained duplex sponges (the in-circuit
    Fiat-Shamir challenger) can be replayed host-side (python fallback
    via hashing.poseidon.permute_host)."""
    chunks = np.ascontiguousarray(chunks, dtype=np.uint64).reshape(-1, 8)
    C = chunks.shape[0]
    state = np.zeros(12, dtype=np.uint64) if init_state is None else \
        np.ascontiguousarray(init_state, dtype=np.uint64).copy()
    carries = np.zeros((C, 4), dtype=np.uint64)
    if lib is not None:
        lib.sponge_carries(_ptr(chunks), C, _ptr(state), _ptr(carries))
        return carries, state
    from ..hashing import poseidon as HP
    s = [int(x) for x in state]
    for c in range(C):
        s[:8] = [int(x) for x in chunks[c]]
        s = HP.permute_host(s)
        carries[c] = s[8:12]
    return carries, np.array(s, dtype=np.uint64)


def permute(state) -> np.ndarray:
    s = np.ascontiguousarray(state, dtype=np.uint64).copy()
    if lib is not None:
        lib.poseidon_permute(_ptr(s))
        return s
    from ..hashing import poseidon as HP
    return np.array(HP.permute_host([int(x) for x in s]), dtype=np.uint64)


def permute_batch(states: np.ndarray) -> np.ndarray:
    """(B, 12) -> (B, 12), each row permuted in place (threaded C++;
    python fallback). The batched Fiat-Shamir challenger's inner op."""
    s = np.ascontiguousarray(states, dtype=np.uint64).copy()
    B = s.shape[0]
    if lib is not None:
        lib.poseidon_permute_batch(_ptr(s), B)
        return s
    from ..hashing import poseidon as HP
    for i in range(B):
        s[i] = HP.permute_host([int(x) for x in s[i]])
    return s


def hash_no_pad_batch(rows: np.ndarray) -> np.ndarray:
    """(B, L) -> (B, 4) rate-8 sponge digests."""
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    B, L = rows.shape
    out = np.zeros((B, 4), dtype=np.uint64)
    if lib is not None:
        lib.hash_no_pad_batch(_ptr(rows), L, B, _ptr(out))
        return out
    from ..hashing import poseidon as HP
    for i in range(B):
        out[i] = HP.hash_no_pad_host([int(x) for x in rows[i]])
    return out


def merkle_paths_batch(leaves: np.ndarray, siblings: np.ndarray,
                       indices: np.ndarray) -> np.ndarray:
    """leaves (P, W), siblings (P, L, 4), indices (P,) -> digests (P, 4).
    One threaded C++ call for every path of one oracle across all
    proofs/queries (python fallback loops merkle_path_digest)."""
    leaves = np.ascontiguousarray(leaves, dtype=np.uint64)
    sibs = np.ascontiguousarray(siblings, dtype=np.uint64)
    idxs = np.ascontiguousarray(indices, dtype=np.uint64)
    P, W = leaves.shape
    L = sibs.shape[1]
    out = np.zeros((P, 4), dtype=np.uint64)
    if lib is not None:
        lib.merkle_paths_batch(_ptr(leaves), W, _ptr(sibs), L,
                               _ptr(idxs), P, _ptr(out))
        return out
    from ..hashing import poseidon as HP
    for i in range(P):
        dig = HP.hash_no_pad_host([int(x) for x in leaves[i]])
        idx = int(idxs[i])
        for s in range(L):
            sib = [int(x) for x in sibs[i, s]]
            l, r = (sib, dig) if idx & 1 else (dig, sib)
            dig = HP.two_to_one_host(l, r)
            idx >>= 1
        out[i] = dig
    return out


def hash_chain_batch(blocks: np.ndarray, init=None) -> np.ndarray:
    """blocks (B, n_blocks, block_len) -> (B, 4) final digests."""
    blocks = np.ascontiguousarray(blocks, dtype=np.uint64)
    B, nb, bl = blocks.shape
    state = np.zeros((B, 4), dtype=np.uint64) if init is None else \
        np.ascontiguousarray(init, dtype=np.uint64).copy()
    if lib is not None:
        lib.hash_chain_batch(_ptr(blocks), B, nb, bl, _ptr(state))
        return state
    from ..hashing import poseidon as HP
    for i in range(B):
        h = [int(x) for x in state[i]]
        for blk in blocks[i]:
            h = HP.hash_no_pad_host(h + [int(x) for x in blk])
        state[i] = h
    return state


_load()
