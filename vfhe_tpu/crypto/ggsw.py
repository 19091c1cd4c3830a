"""Native GGSW ciphertexts + gadget ops (ref: src/vtfhe/crypto/ggsw.rs).

Shape ``(K, ELL, K, N)``: K GLev rows; rows i < K-1 encrypt m * s_i, the
last row encrypts m (ggsw.rs:26-36). Also holds the *native* signed
decomposition and external product — the reference only has these as
circuit gadgets (glwe_poly.rs:28-50, ggsw_ct.rs:98-112); we need native
ones both as the witness-generation fast path and as the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..ntt import ntt_forward as _ntt_fw, ntt_backward as _ntt_bw
from . import glev, glwe, poly


def encrypt(key, s: jnp.ndarray, m: jnp.ndarray, sigma: float,
            ell: int, logb: int) -> jnp.ndarray:
    k = s.shape[0] + 1
    keys = jax.random.split(key, k)
    rows = []
    for i in range(k - 1):
        rows.append(glev.encrypt(keys[i], s, poly.mul(m, s[i]), sigma, ell, logb))
    rows.append(glev.encrypt(keys[k - 1], s, m, sigma, ell, logb))
    return jnp.stack(rows, axis=0)


def compute_ksk(key, s_to: jnp.ndarray, s_from: jnp.ndarray, sigma: float,
                ell: int, logb: int) -> jnp.ndarray:
    """Key-switching key as a GGSW under s_to whose external product undoes
    s_from (ref: ggsw.rs:38-48). Returned in the NTT domain."""
    k = s_to.shape[0] + 1
    n = s_to.shape[1]
    keys = jax.random.split(key, k)
    rows = []
    for i in range(k - 1):
        rows.append(glev.encrypt(keys[i], s_to, s_from[i], sigma, ell, logb))
    rows.append(glev.encrypt(keys[k - 1], s_to, poly.constant(1, n), sigma,
                             ell, logb))
    return ntt_forward(jnp.stack(rows, axis=0))


def dummy_ct(n: int, k: int, ell: int) -> jnp.ndarray:
    return jnp.zeros((k, ell, k, n), dtype=jnp.uint64)


def flatten(ct: jnp.ndarray) -> jnp.ndarray:
    return ct.reshape(*ct.shape[:-4], -1)


def ntt_forward(ct: jnp.ndarray) -> jnp.ndarray:
    return poly.ntt_fw(ct)


# ---------------------------------------------------------------------------
# native gadget decomposition + external product (witness fast path / oracle)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2))
def signed_decompose(x: jnp.ndarray, logb: int, nlimbs: int) -> jnp.ndarray:
    """Centered base-2^logb digits, little-endian, each in [-B/2, B/2].

    Bit-exact native model of the circuit gadget (glwe_poly.rs:28-50):
    if the top bit of x (as a 64-bit word) is set, decompose q - x ... more
    precisely the circuit negates when bit (nlimbs*logb - 1) of x is set,
    decomposes the negation's *64-bit lift*, balances each limb with a
    carry, and flips signs back. Returns shape (nlimbs,) + x.shape of
    canonical field elements.
    """
    x = jnp.asarray(x, jnp.uint64)
    total_bits = nlimbs * logb
    if total_bits - 1 >= 64:
        # e.g. LOGB=5: 13 limbs cover 65 bits; bit 64 of a canonical value is
        # always 0, so the sign path is statically inactive (matches the
        # circuit, where split_le's top bit is the constant 0).
        sgn = jnp.zeros_like(x)
    else:
        sgn = (x >> jnp.uint64(total_bits - 1)) & jnp.uint64(1)
    # the circuit computes plus_or_minus(sgn, x) over the field
    x_centered = jnp.where(sgn == 1, gl.neg(x), x)

    base = jnp.uint64(1 << logb)
    half_mask = jnp.uint64((1 << logb) - 1)
    limbs = []
    carry = jnp.zeros_like(x)
    for i in range(nlimbs):
        k = (x_centered >> jnp.uint64(i * logb)) & half_mask
        k_w_carry = k + carry  # both small, no field wrap
        new_carry = (k >> jnp.uint64(logb - 1)) & jnp.uint64(1)
        balanced = gl.sub(k_w_carry, new_carry * base)
        limbs.append(jnp.where(sgn == 1, gl.neg(balanced), balanced))
        carry = new_carry
    return jnp.stack(limbs, axis=0)


@functools.partial(jax.jit, static_argnums=(2,))
def glev_mul(glev_hat: jnp.ndarray, a: jnp.ndarray, logb: int) -> jnp.ndarray:
    """Gadget product <decomp_topELL(a), glev> in the NTT domain.

    Native model of GlevCt::mul (glev_ct.rs:92-110): decompose ``a`` into
    ceil(64/logb) limbs, keep the top ELL, NTT each, then for every GLWE
    column j: sum_l limb_hat_l * glev_hat[l, j]. Returns an NTT-domain
    GLWE ``(K, N)``.
    """
    ell = glev_hat.shape[0]
    nl = glev.num_limbs(logb)
    limbs = signed_decompose(a, logb, nl)[nl - ell:]  # (ELL, N)
    limbs_hat = _ntt_fw(limbs)
    # (ELL, 1, N) * (ELL, K, N) summed over ELL
    prods = gl.mul(limbs_hat[:, None, :], glev_hat)

    def body(carry, row):
        return gl.add(carry, row), None

    out, _ = jax.lax.scan(body, jnp.zeros(glev_hat.shape[1:], jnp.uint64), prods)
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def external_product(ggsw_hat: jnp.ndarray, ct: jnp.ndarray,
                     logb: int) -> jnp.ndarray:
    """GGSW (NTT domain) external product with a coefficient-domain GLWE.

    Native model of GgswCt::external_product (ggsw_ct.rs:98-112) including
    its sign convention: result = glev_muls[K-1] - sum_{i<K-1} glev_muls[i],
    then inverse NTT.
    """
    k = ct.shape[-2]
    muls = [glev_mul(ggsw_hat[i], ct[i], logb) for i in range(k)]
    acc = muls[k - 1]
    for i in range(k - 1):
        acc = gl.sub(acc, muls[i])
    return _ntt_bw(acc)
