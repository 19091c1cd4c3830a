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


_load()
