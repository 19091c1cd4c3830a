"""Native GLWE layer (ref: src/vtfhe/crypto/glwe.rs).

A GLWE ciphertext is a ``(..., K, N)`` uint64 array: K-1 mask polys then
the body poly. Keys are ``(K-1, N)`` binary polys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from . import poly


def key_gen(key, n: int, k: int) -> jnp.ndarray:
    """K-1 uniform binary polys (ref: glwe.rs:15-17)."""
    return poly.rand_bin(key, (k - 1, n))


def partial_key(key, nz: int, n: int, k: int) -> jnp.ndarray:
    """Binary key whose flattening has only the first ``nz`` coeffs nonzero,
    making the LWE key a prefix of the GLWE key (ref: glwe.rs:19-38)."""
    full = poly.rand_bin(key, (k - 1, n))
    idx = np.arange((k - 1) * n).reshape(k - 1, n)
    return jnp.where(jnp.asarray(idx < nz), full, jnp.uint64(0))


def poly_inner(s: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Sum_i s_i * a_i of negacyclic polys (ref: glwe.rs:40-46)."""
    prods = poly.mul(a, s)  # batched negacyclic products over leading axis

    def body(carry, x):
        return gl.add(carry, x), None

    out, _ = jax.lax.scan(body, jnp.zeros(prods.shape[1:], jnp.uint64),
                          prods)
    return out


def encrypt(key, s: jnp.ndarray, m: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """(ref: glwe.rs:49-57)."""
    kk, n = s.shape[0] + 1, s.shape[1]
    k_mask, k_err = jax.random.split(key)
    mask = poly.rand(k_mask, (kk - 1, n))
    e = poly.rand_error(k_err, (n,), sigma)
    body = gl.add(gl.add(poly_inner(s, mask), e), m)
    return jnp.concatenate([mask, body[None]], axis=0)


def decrypt(ct: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Noisy decryption (ref: glwe.rs:60-63)."""
    return gl.sub(ct[..., -1, :], poly_inner(s, ct[..., :-1, :]))


def _error_dists(ct, s, m) -> np.ndarray:
    mbar = np.asarray(decrypt(ct, s), dtype=np.uint64)
    m = np.asarray(m, dtype=np.uint64)
    diff = np.where(m >= mbar, m - mbar, mbar - m)
    q_minus = (np.uint64(gl.P) - diff)
    return np.minimum(diff, q_minus)


def get_max_error(ct, s, m) -> float:
    """(ref: glwe.rs:65-78)."""
    return float(_error_dists(ct, s, m).max()) / gl.P


def get_avg_error(ct, s, m) -> float:
    """(ref: glwe.rs:80-94)."""
    d = _error_dists(ct, s, m)
    return float(d.astype(object).sum()) / (gl.P * d.size)


def sample_extract(ct: jnp.ndarray) -> jnp.ndarray:
    """Extract the constant-coeff LWE ciphertext: for each mask poly emit
    [c_0, -c_{N-1}, ..., -c_1], then the body's constant coeff
    (ref: glwe.rs:96-106)."""
    k, n = ct.shape[-2], ct.shape[-1]
    masks = ct[..., :-1, :]
    rest = gl.neg(jnp.flip(masks[..., 1:], axis=-1))
    rows = jnp.concatenate([masks[..., :1], rest], axis=-1)
    flat = rows.reshape(*ct.shape[:-2], (k - 1) * n)
    return jnp.concatenate([flat, ct[..., -1, :1]], axis=-1)


def partial_sample_extract(ct: jnp.ndarray, nz: int) -> jnp.ndarray:
    """(ref: glwe.rs:108-113)."""
    full = sample_extract(ct)
    return jnp.concatenate([full[..., :nz], full[..., -1:]], axis=-1)


def dummy_ct(n: int, k: int) -> jnp.ndarray:
    """All-zero ciphertext (ref: glwe.rs:121-125)."""
    return jnp.zeros((k, n), dtype=jnp.uint64)


def trivial_ct(m: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero mask, body = m (ref: glwe.rs:127-131)."""
    n = m.shape[-1]
    return jnp.concatenate([jnp.zeros((k - 1, n), jnp.uint64), m[None]], axis=0)


def flatten(ct: jnp.ndarray) -> jnp.ndarray:
    return ct.reshape(*ct.shape[:-2], -1)


def from_flat(flat: jnp.ndarray, n: int, k: int) -> jnp.ndarray:
    return flat.reshape(*flat.shape[:-1], k, n)


def flatten_key(s: jnp.ndarray) -> jnp.ndarray:
    return s.reshape(-1)


def flatten_partial_key(s: jnp.ndarray, nz: int) -> jnp.ndarray:
    """(ref: glwe.rs:145-147)."""
    return flatten_key(s)[:nz]


def ntt_forward(ct: jnp.ndarray) -> jnp.ndarray:
    return poly.ntt_fw(ct)


def ntt_backward(ct: jnp.ndarray) -> jnp.ndarray:
    return poly.ntt_bw(ct)
