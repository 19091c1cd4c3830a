"""Negacyclic NTT parameter tables, generated at import time in Python.

Rebuilds (and generalizes) the reference's offline Sage pipeline
(src/ntt/gen_param_file.sage:97-120) that emitted one hardcoded
``params_{N}.rs`` per ring dimension (src/ntt/params_8.rs etc.):

* psi = g^((q-1)/(2N)) with g = 7 (Sage's ``primitive_root(q)``),
  a primitive 2N-th root of unity => negacyclic wrapped convolution.
* ROOTS / INVROOTS are the *bit-reversed* tables [psi^j], [psi^-j],
  exactly as the Sage script writes them (gen_param_file.sage:112-113),
  so stage ``m`` of the iterative NTT indexes twiddles at [m..2m).
* NINV = 2^-LOGN.

Generation is cheap (O(N) modexps), cached per N, and bit-exact against
the reference's committed tables — tests/test_ntt.py checks the N=8
table values and all committed TESTG/TESTGHAT vectors.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..field import goldilocks as gl


def bit_reverse_index(index: int, log_size: int) -> int:
    return int(bin(index)[2:].rjust(log_size, "0")[::-1], 2)


def bit_reverse_permutation(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    return np.array([bit_reverse_index(i, logn) for i in range(n)],
                    dtype=np.int64)


@dataclass(frozen=True)
class NttParams:
    n: int
    logn: int
    ninv: int
    roots: np.ndarray      # (N,) uint64, bit-reversed psi^j table
    invroots: np.ndarray   # (N,) uint64, bit-reversed psi^-j table


@functools.lru_cache(maxsize=None)
def get_params(n: int) -> NttParams:
    assert n & (n - 1) == 0 and n >= 2, "ring dimension must be a power of two"
    logn = n.bit_length() - 1
    psi = gl.primitive_root_of_unity(2 * n)
    psi_inv = gl.h_inv(psi)

    roots = np.empty(n, dtype=np.uint64)
    invroots = np.empty(n, dtype=np.uint64)
    acc_f, acc_b = 1, 1
    fwd = np.empty(n, dtype=np.uint64)
    bwd = np.empty(n, dtype=np.uint64)
    for j in range(n):
        fwd[j] = acc_f
        bwd[j] = acc_b
        acc_f = gl.h_mul(acc_f, psi)
        acc_b = gl.h_mul(acc_b, psi_inv)

    perm = bit_reverse_permutation(n)
    roots[:] = fwd[perm]
    invroots[:] = bwd[perm]

    ninv = gl.h_inv(n % gl.P)
    return NttParams(n=n, logn=logn, ninv=ninv, roots=roots, invroots=invroots)
