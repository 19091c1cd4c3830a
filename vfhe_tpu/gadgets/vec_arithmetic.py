"""Vector gadget helpers (ref: src/vec_arithmetic.rs).

Thin, API-parity wrappers over the builder's vector ops — the reference
emits one gate per element (vec_arithmetic.rs:6-64); here each call is a
single vectorized ledger entry.
"""

from __future__ import annotations

import numpy as np


def vec_add(b, x, y) -> np.ndarray:
    """(ref: vec_arithmetic.rs:6-15)."""
    return b.add_vec(np.asarray(x), np.asarray(y))


def vec_mul(b, x, y) -> np.ndarray:
    """(ref: vec_arithmetic.rs:18-27)."""
    return b.mul_vec(np.asarray(x), np.asarray(y))


def scalar_mul(b, scalar: int, x) -> np.ndarray:
    """scalar is a TARGET; multiplies every element (ref: :29-35)."""
    x = np.asarray(x)
    return b.mul_vec(np.full(x.shape, scalar, dtype=np.int64), x)


def vec_add_many(b, vecs) -> np.ndarray:
    """Sum a list of equal-length target vectors (ref: :38-47)."""
    acc = np.asarray(vecs[0])
    for v in vecs[1:]:
        acc = b.add_vec(acc, np.asarray(v))
    return acc


def vec_inner(b, lefts, rights) -> np.ndarray:
    """Inner product of two lists of vectors: sum_i lefts[i] * rights[i]
    (ref: :49-64) — one DOT-gate lane per output element."""
    n = min(len(lefts), len(rights))   # zip truncation, as the ref does
    lefts = [np.asarray(l) for l in lefts[:n]]
    rights = [np.asarray(r) for r in rights[:n]]
    return b.dot_vec(lefts, rights)
