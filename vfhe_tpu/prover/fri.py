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


@functools.partial(jax.jit, static_argnums=(2,))
def _grind_kernel_multi(states, bound, batch: int):
    """The WHOLE grind for B independent sponge states in ONE dispatch:
    a device-side while_loop scans non-overlapping ascending windows of
    ``batch`` candidates (candidate w in slot 0 of every state) until
    every instance has a hit, and returns the (B,) first-hit witnesses.

    Scan order per instance is the candidate sequence 0, 1, 2, ...;
    the first hit is independent of the window size, so the found
    witnesses — and hence the proofs — are bit-identical to the old
    per-round host loop. That loop cost one host->device round plus a
    blocking scalar fetch per window (~36 ms each through the TPU
    tunnel), and its host wakeups contended with the witness-prefetch
    threads of the NEXT prover batch: "pow grind" measured 1.16 s
    median per batch-8 in the round-5 full run vs 0.12-0.4 s isolated.
    One dispatch + one 8B-per-instance fetch makes the scope
    contention-immune."""
    B = states.shape[0]

    def window(carry):
        start, found, wit = carry
        cand = start + jnp.arange(batch, dtype=jnp.uint64)     # (W,)
        st = jnp.broadcast_to(states[:, None, :], (B, batch, 12))
        st = st.at[:, :, 0].set(jnp.broadcast_to(cand, (B, batch)))
        out0 = H.permute_fast(st.reshape(B * batch, 12),
                              False)[:, 0].reshape(B, batch)
        hit = out0 < bound                                     # (B, W)
        any_hit = hit.any(axis=1)
        first = start + jnp.argmax(hit, axis=1).astype(jnp.uint64)
        wit = jnp.where(~found & any_hit, first, wit)
        return (start + jnp.uint64(batch), found | any_hit, wit)

    carry = (jnp.uint64(0), jnp.zeros(B, bool),
             jnp.zeros(B, jnp.uint64))
    _, _, wit = jax.lax.while_loop(lambda c: ~c[1].all(), window, carry)
    return wit


def grind(ch: Challenger, pow_bits: int) -> int:
    """Find a witness w s.t. observing [w] then sampling yields an element
    with ``pow_bits`` leading zero bits. Scan order is the candidate
    sequence 0, 1, 2, ... — the found witness is the globally first
    hit (one-instance case of :func:`grind_batch`)."""
    return grind_batch([ch], pow_bits)[0]


def grind_batch(chs: list, pow_bits: int) -> list:
    """``grind`` for B independent challengers in ONE device dispatch
    (see :func:`_grind_kernel_multi`)."""
    for ch in chs:
        if ch._inputs:
            ch._duplex()
            ch._outputs.clear()
    bound = np.uint64(1) << np.uint64(64 - pow_bits)
    states = jnp.asarray(np.stack([np.asarray(ch._state) for ch in chs]))
    wit = np.asarray(_grind_kernel_multi(states, bound, _GRIND_BATCH))
    return [int(w) for w in wit]


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
