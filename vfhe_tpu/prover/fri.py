"""FRI low-degree proofs: batched folding, grinding, query openings.

Rebuild of plonky2's fri module (the polynomial-commitment engine every
reference proof runs through; SURVEY.md section 7 stage 6). The codeword
lives in the quadratic extension on the LDE coset; folding is arity-4.

TPU-first: a fold is two small dense per-point contractions over the
whole codeword (a 4-point DFT across the coset stride plus a Horner in
beta/x^-1), so each layer is a handful of fused vector ops; Merkle
commits reuse the batched Poseidon tree.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as ee
from ..hashing import poseidon as H
from . import merkle
from .challenger import Challenger
from .fft import COSET_SHIFT, ifft


@dataclass
class FriConfig:
    rate_bits: int = 3
    arity_bits: int = 2
    num_queries: int = 28
    pow_bits: int = 16
    final_poly_len: int = 32   # max coeffs of the final polynomial


@dataclass
class FriLayerOpening:
    leaf: np.ndarray      # (arity, 2) values
    siblings: list


@dataclass
class FriQueryRound:
    layers: list          # [FriLayerOpening]


@dataclass
class FriProof:
    caps: list            # merkle caps of committed layers
    final_coeffs: np.ndarray   # (final_len, 2)
    pow_witness: int
    query_indices: np.ndarray
    query_rounds: list    # [FriQueryRound]


@functools.lru_cache(maxsize=None)
def _inv_x_table(n: int, shift: int) -> np.ndarray:
    """x_i^{-1} = shift^{-1} * k^{-i} for the order-n coset, natural order."""
    k_inv = gl.h_inv(gl.primitive_root_of_unity(n))
    s_inv = gl.h_inv(shift % gl.P)
    out = np.empty(n, dtype=np.uint64)
    acc = s_inv
    for i in range(n):
        out[i] = acc
        acc = gl.h_mul(acc, k_inv)
    return out


@functools.lru_cache(maxsize=None)
def _omega_dft_table(n: int, arity: int) -> np.ndarray:
    """(arity, arity) matrix W[j, t] = omega^{-jt}, omega = k^(n/arity)."""
    omega_inv = gl.h_inv(gl.h_pow(gl.primitive_root_of_unity(n), n // arity))
    m = np.empty((arity, arity), dtype=np.uint64)
    for j in range(arity):
        for t in range(arity):
            m[j, t] = gl.h_pow(omega_inv, j * t)
    return m


@functools.partial(jax.jit, static_argnums=(2, 3))
def fold_layer(values: jnp.ndarray, beta: jnp.ndarray, n: int,
               shift: int) -> jnp.ndarray:
    """(n, 2) ext codeword over coset shift*K_n -> (n/4, 2) folded codeword.

    G'(x^A) = (1/A) * sum_j (beta/x)^j * sum_t omega^{-jt} G(x omega^t).
    """
    A = 4
    m = n // A
    v = values.reshape(A, m, 2)           # v[t, i] = G at index i + t*m
    dft = jnp.asarray(_omega_dft_table(n, A))  # (A, A)
    # W[j, i] = sum_t dft[j, t] * v[t, i]
    w = ee.mul_base(v[None, :, :, :],
                    jnp.broadcast_to(dft[:, :, None], (A, A, m)))
    w = _ext_sum(w, axis=1)               # (A, m, 2)
    inv_x = jnp.asarray(_inv_x_table(n, shift)[:m])
    bx = ee.mul_base(jnp.broadcast_to(beta, (m, 2)), inv_x)  # (m, 2)
    # Horner over j
    acc = w[A - 1]
    for j in range(A - 2, -1, -1):
        acc = ee.add(ee.mul(acc, bx), w[j])
    inv_a = gl.h_inv(A)
    return ee.mul_base(acc, jnp.full((m,), np.uint64(inv_a)))


def _ext_sum(x, axis):
    def body(carry, row):
        return gl.add(carry, row), None
    moved = jnp.moveaxis(x, axis, 0)
    out, _ = jax.lax.scan(body, jnp.zeros_like(moved[0]), moved)
    return out


def _layer_leaves(values: jnp.ndarray) -> jnp.ndarray:
    """Group a (n, 2) codeword into (n/4, 8) Merkle leaves: leaf i holds the
    arity coset {i + t*n/4}."""
    n = values.shape[0]
    m = n // 4
    return jnp.moveaxis(values.reshape(4, m, 2), 0, 1).reshape(m, 8)


_GRIND_BATCH = 1 << 15


@functools.partial(jax.jit, static_argnums=(3,))
def _grind_kernel(state, start, bound, batch: int):
    """One grind round ON DEVICE: expand the 12-element sponge state to
    ``batch`` candidate states (candidate w in slot 0), permute, and
    return the FIRST index whose output element 0 clears ``bound``
    (-1 if none). Only 96 B go up and 8 B come back per round — the
    previous host-tiled form shipped a (batch, 12) u64 array up
    (3 MB at 2^15) and the full output column back per instance per
    round, which made PoW the largest steady-state term of a batch-8
    paper-shape prove (round-4 sub-scope profile: 1.1-1.3 s of a 4.0 s
    batch, nearly all tunnel bytes)."""
    cand = start + jnp.arange(batch, dtype=jnp.uint64)
    states = jnp.broadcast_to(state, (batch, state.shape[0]))
    states = states.at[:, 0].set(cand)
    hit = H.permute_fast(states, False)[:, 0] < bound
    first = jnp.argmax(hit).astype(jnp.int64)
    return jnp.where(jnp.any(hit), first, jnp.int64(-1))


def grind(ch: Challenger, pow_bits: int) -> int:
    """Find a witness w s.t. observing [w] then sampling yields an element
    with ``pow_bits`` leading zero bits. Scan order is the candidate
    sequence 0, 1, 2, ... chunked ``_GRIND_BATCH`` at a time — the found
    witness is the globally first hit, independent of the chunking."""
    if ch._inputs:
        ch._duplex()
        ch._outputs.clear()
    state = jnp.asarray(np.asarray(ch._state))
    bound = np.uint64(1) << np.uint64(64 - pow_bits)
    batch = _GRIND_BATCH
    start = 0
    while True:
        ix = int(_grind_kernel(state, np.uint64(start), bound, batch))
        if ix >= 0:
            return start + ix
        start += batch


def grind_batch(chs: list, pow_bits: int) -> list:
    """``grind`` for B independent challengers with the dispatches
    PIPELINED: all pending instances' rounds are queued async and their
    first-hit indices fetched with ONE device_get (8 B each), so a B=8
    prover pays ~3 tunnel round-trips of scalars total. Scan order per
    instance is identical to ``grind`` — the found witnesses (and hence
    the proofs) are bit-identical."""
    import jax as _jax
    for ch in chs:
        if ch._inputs:
            ch._duplex()
            ch._outputs.clear()
    bound = np.uint64(1) << np.uint64(64 - pow_bits)
    batch = _GRIND_BATCH
    states = [jnp.asarray(np.asarray(ch._state)) for ch in chs]
    found: list = [None] * len(chs)
    start = 0
    while True:
        pend = [b for b, f in enumerate(found) if f is None]
        if not pend:
            return found
        outs = [_grind_kernel(states[b], np.uint64(start), bound, batch)
                for b in pend]               # queue async, fetch once
        for b, ix in zip(pend, _jax.device_get(outs)):
            if ix >= 0:
                found[b] = start + int(ix)
        start += batch


def check_pow(ch: Challenger, witness: int, pow_bits: int) -> bool:
    ch.observe([witness])
    return ch.sample() < (1 << (64 - pow_bits))


def commit_phase(codeword: jnp.ndarray, shift: int, ch: Challenger,
                 cfg: FriConfig):
    """Fold the (n,2) codeword down to the final polynomial.

    Returns (trees, betas, layer_sizes, layer_shifts, final_coeffs)."""
    trees = []
    betas = []
    sizes = []
    shifts = []
    v = codeword
    n = v.shape[0]
    while n > (cfg.final_poly_len << cfg.rate_bits):
        tree = merkle.build(_layer_leaves(v))
        trees.append(tree)
        ch.observe_cap(np.asarray(tree.cap))
        beta = jnp.asarray(ch.sample_ext())
        betas.append(np.asarray(beta))
        sizes.append(n)
        shifts.append(shift)
        v = fold_layer(v, beta, n, shift)
        shift = gl.h_pow(shift, 4)
        n = v.shape[0]

    # final polynomial: interpolate the remaining codeword over its coset
    inv_pows = _inv_x_table(n, shift)  # shift^-1 * k^-i ... need coeff recovery
    # coeffs of p from values on shift*K: p(shift*k^i) -> ifft then unscale
    vals = jnp.moveaxis(v, -1, 0)          # (2, n)
    coeffs = ifft(vals)
    unscale = np.empty(n, dtype=np.uint64)
    acc = 1
    s_inv = gl.h_inv(shift % gl.P)
    for i in range(n):
        unscale[i] = acc
        acc = gl.h_mul(acc, s_inv)
    coeffs = gl.mul(coeffs, jnp.asarray(unscale))
    coeffs = jnp.moveaxis(coeffs, 0, -1)   # (n, 2)
    final_len = n >> cfg.rate_bits
    final_coeffs = np.asarray(coeffs[:final_len])
    tail = np.asarray(coeffs[final_len:])
    assert (tail == 0).all(), "final FRI polynomial exceeds degree bound"
    ch.observe(final_coeffs.ravel())
    return trees, betas, sizes, shifts, final_coeffs


def query_phase(trees, sizes, ch: Challenger, cfg: FriConfig, n0: int):
    """Sample query indices and open every layer along each query path
    (bulk gathers: one device fetch per level per layer)."""
    import jax
    indices = ch.sample_indices(int(np.log2(n0)), cfg.num_queries)
    reduced = [np.asarray(indices)]
    for n in sizes:
        reduced.append(reduced[-1] % (n // 4))
    # ONE device->host transfer for every layer's paths
    fetches = [merkle.open_paths_gather(tree, reduced[li + 1])
               for li, tree in enumerate(trees)]
    hosts = jax.device_get(fetches)
    per_layer = [merkle.open_paths_finish(h, reduced[li + 1])
                 for li, h in enumerate(hosts)]
    rounds = []
    for qi in range(len(indices)):
        layers = []
        for li in range(len(trees)):
            leaf, sibs = per_layer[li][qi]
            layers.append(FriLayerOpening(leaf=leaf.reshape(4, 2),
                                          siblings=sibs))
        rounds.append(FriQueryRound(layers=layers))
    return indices, rounds


def verify_query(round_: FriQueryRound, caps, q: int, g_value: np.ndarray,
                 betas, sizes, shifts, final_coeffs, n0: int,
                 shift0: int) -> bool:
    """Check one query path: committed leaf matches the oracle-derived
    G value, folds are consistent, and the final poly agrees."""
    qi = int(q)
    value = np.asarray(g_value, dtype=np.uint64)
    n_final, shift_final = n0, shift0
    for li, (opening, n, shift, beta) in enumerate(
            zip(round_.layers, sizes, shifts, betas)):
        m = n // 4
        r = qi % m
        t = qi // m
        if not merkle.verify_path(opening.leaf.reshape(8), r,
                                  opening.siblings, np.asarray(caps[li])):
            return False
        if not (opening.leaf[t] == value).all():
            return False
        value = np.asarray(_fold_point(opening.leaf, r, n, shift,
                                       np.asarray(beta)))
        qi = r
        n_final, shift_final = n // 4, gl.h_pow(shift, 4)
    # final polynomial evaluation at the surviving point
    x = gl.h_mul(shift_final,
                 gl.h_pow(gl.primitive_root_of_unity(n_final), qi))
    want = _eval_ext_poly(final_coeffs, x)
    return (want == value).all()


def _fold_point(leaf4: np.ndarray, idx: int, n: int, shift: int,
                beta) -> np.ndarray:
    """Host-side single-coset fold (same math as fold_layer, python ints)."""
    from ..field import host as hf
    A = 4
    dft = _omega_dft_table(n, A)
    vals = [hf.from_array(leaf4[t]) for t in range(A)]
    w = []
    for j in range(A):
        acc = hf.ext(0)
        for t in range(A):
            acc = hf.add(acc, hf.mul_base(vals[t], int(dft[j, t])))
        w.append(acc)
    x_inv = int(_inv_x_table(n, shift)[idx])
    bx = hf.mul_base(hf.from_array(beta), x_inv)
    acc = w[A - 1]
    for j in range(A - 2, -1, -1):
        acc = hf.add(hf.mul(acc, bx), w[j])
    acc = hf.mul_base(acc, gl.h_inv(A))
    return np.array(acc, dtype=np.uint64)


def _eval_ext_poly(coeffs: np.ndarray, x: int) -> np.ndarray:
    """Evaluate an extension poly (given (L,2) coeffs) at a BASE point x."""
    from ..field import host as hf
    acc = hf.ext(0)
    for c in coeffs[::-1]:
        acc = hf.add(hf.mul_base(acc, x), hf.from_array(c))
    return np.array(acc, dtype=np.uint64)
