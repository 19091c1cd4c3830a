"""Pallas (Mosaic) Goldilocks kernels on 2x32-bit limbs.

Mosaic has no 64-bit integer lanes (CLAUDE.md pitfall 6), so field
elements live as (lo32, hi32) uint32 pairs; the 128-bit product is built
from 16-bit sub-limb partial products (16 u32 multiplies) and reduced
with the 2^64 = eps, 2^96 = -1 identities — the same algorithm as
field/goldilocks._mul_wide/_reduce128, expressed in u32 lanes.

Purpose: an empirical check on the roofline claim (CLAUDE.md pitfall 8)
that XLA's emulated-u64 path already runs at the VPU's integer
speed-of-light — bench.py compares a single HBM-bound mulmod and a
compute-bound x^(2^k) square chain in both lowerings. If the Pallas
numbers ever pull ahead on real hardware, this module is the seed of a
full NTT/Poseidon kernel port; until then the jnp path stays canonical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars (NOT jnp values: a traced jnp constant captured by a
# pallas kernel body is rejected by the lowering)
_M16 = np.uint32(0xFFFF)
_EPS = np.uint32(0xFFFF_FFFF)
_ONE = np.uint32(1)
_ZERO = np.uint32(0)


def split_u64(x: jnp.ndarray):
    """uint64 array -> (lo32, hi32) uint32 arrays."""
    return ((x & jnp.uint64(0xFFFF_FFFF)).astype(jnp.uint32),
            (x >> jnp.uint64(32)).astype(jnp.uint32))


def join_u64(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _mulmod_u32(alo, ahi, blo, bhi):
    """(lo,hi) x (lo,hi) -> canonical (lo,hi), all uint32 lanes."""
    a = [alo & _M16, alo >> 16, ahi & _M16, ahi >> 16]
    b = [blo & _M16, blo >> 16, bhi & _M16, bhi >> 16]
    # column sums of 16-bit pieces: each col accumulates <= 8 values
    # < 2^16 -> < 2^19, no u32 overflow
    cols = [jnp.zeros_like(alo) for _ in range(8)]
    for i in range(4):
        for j in range(4):
            p = a[i] * b[j]                       # 16x16 -> exact in u32
            cols[i + j] = cols[i + j] + (p & _M16)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    # carry-propagate into 8 exact 16-bit limbs of the 128-bit product
    r = []
    c = jnp.zeros_like(alo)
    for k in range(8):
        t = cols[k] + c
        r.append(t & _M16)
        c = t >> 16
    n0 = r[0] | (r[1] << 16)
    n1 = r[2] | (r[3] << 16)
    n2 = r[4] | (r[5] << 16)
    n3 = r[6] | (r[7] << 16)

    # t0 = lo64 - hi_hi  (hi_hi = n3), mod 2^64 with eps fixup on borrow
    t0_lo = n0 - n3
    b0 = (n0 < n3).astype(jnp.uint32)
    t0_hi = n1 - b0
    brw = (n1 < b0).astype(jnp.uint32)            # 64-bit borrow
    # conditional t0 -= eps: lo += 1 with carry unless lo was all-ones
    sub_lo = t0_lo + _ONE
    sub_bw = (t0_lo != _EPS).astype(jnp.uint32)
    t0_lo = jnp.where(brw == 1, sub_lo, t0_lo)
    t0_hi = jnp.where(brw == 1, t0_hi - sub_bw, t0_hi)

    # t1 = n2 * eps = (n2 << 32) - n2
    t1_lo = _ZERO - n2
    t1_hi = n2 - (n2 != 0).astype(jnp.uint32)

    # t2 = t0 + t1 mod 2^64, overflow -> += eps
    s_lo = t0_lo + t1_lo
    c0 = (s_lo < t0_lo).astype(jnp.uint32)
    s_hi1 = t0_hi + t1_hi
    c1 = (s_hi1 < t0_hi).astype(jnp.uint32)
    s_hi = s_hi1 + c0
    c2 = (s_hi < s_hi1).astype(jnp.uint32)
    ov = c1 | c2
    add_lo = s_lo - _ONE                          # s_lo + eps mod 2^32
    add_cy = (s_lo != 0).astype(jnp.uint32)
    s_lo = jnp.where(ov == 1, add_lo, s_lo)
    s_hi = jnp.where(ov == 1, s_hi + add_cy, s_hi)

    # canonicalize: value >= p  <=>  hi == eps and lo >= 1
    geq = (s_hi == _EPS) & (s_lo >= _ONE)
    out_lo = jnp.where(geq, s_lo - _ONE, s_lo)
    out_hi = jnp.where(geq, _ZERO, s_hi)
    return out_lo, out_hi


def _make_kernel(chain: int):
    def kernel(alo_ref, ahi_ref, blo_ref, bhi_ref, olo_ref, ohi_ref):
        lo, hi = _mulmod_u32(alo_ref[:], ahi_ref[:],
                             blo_ref[:], bhi_ref[:])
        for _ in range(chain - 1):                # compute-bound variant:
            lo, hi = _mulmod_u32(lo, hi, lo, hi)  # square chain in-regs
        olo_ref[:] = lo
        ohi_ref[:] = hi
    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def _mulmod_call(ab_lo_hi, _unused=None, chain: int = 1,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    alo, ahi, blo, bhi = ab_lo_hi
    shape = alo.shape
    rows = shape[0]
    blk = min(rows, 256)
    grid = (rows // blk,)
    # i*0, not the literal 0: under jax_enable_x64 a literal traces as
    # int64 while the program id is int32, and Mosaic rejects the mixed
    # (i32, i64) index-map return ("failed to legalize func.return")
    spec = pl.BlockSpec((blk, shape[1]), lambda i: (i, i * 0))
    out = pl.pallas_call(
        _make_kernel(chain),
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.uint32),
                   jax.ShapeDtypeStruct(shape, jnp.uint32)),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        interpret=interpret,
    )(alo, ahi, blo, bhi)
    return out


def mulmod(a: jnp.ndarray, b: jnp.ndarray, chain: int = 1,
           interpret: bool = False) -> jnp.ndarray:
    """Canonical a*b mod p via the Pallas kernel ((B, N) uint64 in/out).
    ``chain`` > 1 squares the product chain-1 more times in-registers
    (the compute-bound benchmark variant)."""
    alo, ahi = split_u64(a)
    blo, bhi = split_u64(b)
    lo, hi = _mulmod_call((alo, ahi, blo, bhi), chain=chain,
                          interpret=interpret)
    return join_u64(lo, hi)
