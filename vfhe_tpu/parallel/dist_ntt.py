"""Distributed negacyclic NTT: butterfly stages exchanged over the mesh.

The single-chip NTT (ntt/ntt.py) runs LOGN fused vector stages. Here one
polynomial's stages are split across the ``col`` mesh axis the way the
butterfly graph itself factors (the BASELINE north star: "NTT butterfly
stages exchange via all-to-all over ICI"):

With the poly axis in D contiguous chunks of M = N/D, stage ``logm``
pairs elements at distance t = N/(2m):

* stages 0..logD-1 (t >= M) pair elements in DIFFERENT chunks, but the
  partners share the same within-chunk offset — so after ONE all-to-all
  transpose (chunk axis <-> offset axis) they are LOCAL butterflies
  along the chunk axis, and the twiddle (roots[m + i//(2t)]) depends
  only on the chunk index: the stage is exactly ``_fw_stage`` applied
  along a length-D axis with the global root table.
* stages logD..logN-1 (t <= M/2) stay inside one chunk; chunk k's
  stage-``logm`` twiddles are the contiguous slice
  roots[(D + k) * m_loc : (D + k + 1) * m_loc] (the bit-reversed-index
  table property: chunk k is the subtree rooted at node D + k), so each
  device runs the tail stages with a precomputed per-device table.

Total communication: TWO all-to-alls per transform (in, out of the
transposed layout) — the four-step FFT pattern, expressed through the
same ``_fw_stage``/``_bw_stage`` kernels as the single-chip path, so
results are bit-identical (ref twiddle convention: src/ntt/mod.rs:12-70).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:                       # older jax
    from jax.experimental.shard_map import shard_map

from ..field import goldilocks as gl
from ..ntt.ntt import _bw_stage, _fw_stage
from ..ntt.params import get_params


@functools.lru_cache(maxsize=None)
def _local_tables(n: int, d: int, forward: bool) -> np.ndarray:
    """(D, M) per-chunk twiddle tables for the local tail stages:
    table[k][m_loc + g] = roots[(D + k) * m_loc + g]."""
    p = get_params(n)
    roots = p.roots if forward else p.invroots
    m_total = n // d
    out = np.zeros((d, m_total), dtype=np.uint64)
    for k in range(d):
        m_loc = 1
        while m_loc < m_total:
            out[k, m_loc:2 * m_loc] = \
                roots[(d + k) * m_loc:(d + k + 1) * m_loc]
            m_loc *= 2
    return out


def _transpose_in(x, axis_name):
    """(B, M) chunk-k local -> (B, D, M/D) slab local: device j receives,
    for every chunk k, the offsets [j*M/D, (j+1)*M/D)."""
    B, M = x.shape
    d = jax.lax.axis_size(axis_name)
    xr = x.reshape(B, d, M // d)
    return jax.lax.all_to_all(xr, axis_name, split_axis=1, concat_axis=1)


def _transpose_out(y, axis_name):
    """Inverse of _transpose_in: (B, D, M/D) slab -> (B, M) chunk."""
    B, d, md = y.shape
    z = jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=1)
    return z.reshape(B, d * md)


def make_dist_ntt(mesh: Mesh, n: int, axis_name: str = "col"):
    """(forward, backward) jitted transforms on (B, n) arrays with the
    poly axis sharded over ``axis_name``. Bit-identical to
    ntt_forward/ntt_backward."""
    d = int(mesh.shape[axis_name])
    assert n % d == 0 and d & (d - 1) == 0
    m = n // d
    logd = d.bit_length() - 1
    logm_total = m.bit_length() - 1
    p = get_params(n)
    roots_g = jnp.asarray(p.roots)
    invroots_g = jnp.asarray(p.invroots)
    fw_tab = jnp.asarray(_local_tables(n, d, True))
    bw_tab = jnp.asarray(_local_tables(n, d, False))
    ninv = jnp.uint64(p.ninv)

    def fw_local(x, tab):
        # x: (B, M) chunk k; tab: (1, M) this device's tail twiddles
        if logd:
            y = _transpose_in(x, axis_name)           # (B, D, M/D)
            y = jnp.moveaxis(y, 1, -1)                # (B, M/D, D)
            for logm in range(logd):
                y = _fw_stage(y, roots_g, 1 << logm)  # cross-chunk stages
            y = jnp.moveaxis(y, -1, 1)
            x = _transpose_out(y, axis_name)          # (B, M) chunk k
        tab = tab[0]
        for logm in range(logm_total):
            x = _fw_stage(x, tab, 1 << logm)          # local tail stages
        return x

    def bw_local(x, tab):
        tab = tab[0]
        for logm in reversed(range(logm_total)):
            x = _bw_stage(x, tab, 1 << logm)          # local stages first
        if logd:
            y = _transpose_in(x, axis_name)
            y = jnp.moveaxis(y, 1, -1)
            for logm in reversed(range(logd)):
                y = _bw_stage(y, invroots_g, 1 << logm)
            y = jnp.moveaxis(y, -1, 1)
            x = _transpose_out(y, axis_name)
        return gl.mul(x, ninv)

    spec_x = P(None, axis_name)
    spec_tab = P(axis_name, None)

    def wrap(f):
        return shard_map(f, mesh=mesh, in_specs=(spec_x, spec_tab),
                         out_specs=spec_x)

    fw_sm = wrap(fw_local)
    bw_sm = wrap(bw_local)

    @jax.jit
    def forward(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec_x))
        return fw_sm(x, fw_tab)

    @jax.jit
    def backward(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec_x))
        return bw_sm(x, bw_tab)

    return forward, backward
