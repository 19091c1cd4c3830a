"""Batched / sharded prover device core.

The hot per-step device pipeline (witness gen -> trace -> iFFT -> coset
LDE -> Merkle leaf digests -> permutation aux -> quotient) vmapped over a
batch of independent proof instances and sharded over a (dp, col) mesh:
``dp`` carries whole instances (ciphertext batching — the proofs/s
scaling axis), ``col`` splits polynomial columns inside each instance
(column-parallel transforms + row-sharded hashing).

This is the unit the multi-chip dry run compiles, and the building block
for a fully batched multi-ciphertext prover (host transcripts interleave
between device phases).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import goldilocks as gl
from ..hashing import poseidon as HP
from ..prover.fft import coset_lde, ifft
from ..prover.prove import preprocess
from .mesh import make_mesh


def make_step_core(sc_data):
    """Per-instance device core for one step circuit. Returns a function
    (w0 (T+1,), betas, gammas, alphas, pi_hash) -> (leaf_digests, quotient)
    containing every heavy device stage of prove()."""
    pre = preprocess(sc_data)
    cfg = sc_data.config
    wire_index = jnp.asarray(sc_data.wire_index)
    perm_fn = pre["perm_fn"]
    quotient_fn = pre["quotient_fn"]

    def core(w0, betas, gammas, alphas, pi_hash):
        w = getattr(sc_data.witness_fn, "raw", sc_data.witness_fn)(w0)
        trace = w[wire_index]
        wires_cols = jnp.transpose(trace)
        wire_coeffs = ifft(wires_cols)
        wire_lde = coset_lde(wire_coeffs, cfg.rate_bits)
        digests = HP.hash_no_pad(jnp.transpose(wire_lde))
        aux = perm_fn(trace[:, :cfg.num_routed_wires], betas, gammas,
                      pre["tables"])
        aux_lde = coset_lde(ifft(aux), cfg.rate_bits)
        quot = quotient_fn(wire_lde, aux_lde, pi_hash, betas, gammas, alphas,
                           pre["tables"])
        return digests, quot

    return core


def make_batched_step_core(sc_data, mesh):
    """The batched device pipeline with REAL (dp, col) sharding: the
    batch axis over ``dp``, and inside each instance the polynomial
    COLUMNS over ``col`` for iFFT/coset-LDE (columns are independent —
    zero communication), with the Merkle leaf hashing row-sharded (the
    single col<->row transpose is the all-to-all XLA inserts). The
    permutation/quotient kernels run dp-sharded (their column count per
    challenge is small)."""
    pre = preprocess(sc_data)
    cfg = sc_data.config
    wire_index = jnp.asarray(sc_data.wire_index)
    witness_b = jax.vmap(getattr(sc_data.witness_fn, "raw",
                                 sc_data.witness_fn))
    perm_b = jax.vmap(pre["perm_fn"], in_axes=(0, 0, 0, None))
    quot_b = jax.vmap(pre["quotient_fn"], in_axes=(0, 0, 0, 0, 0, 0, None))

    def shard(x, *axes):
        spec = [None] * x.ndim
        spec[0] = "dp"
        for ax, name in axes:
            spec[ax] = name
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    def core(w0_batch, betas, gammas, alphas, pi_hash):
        w = witness_b(shard(w0_batch))
        trace = w[:, wire_index]                       # (B, h, W)
        wires_cols = shard(jnp.swapaxes(trace, 1, 2), (1, "col"))
        wire_coeffs = ifft(wires_cols)                 # per-column FFTs
        wire_lde = shard(coset_lde(wire_coeffs, cfg.rate_bits), (1, "col"))
        # leaf hashing: rows over col (the transpose = one all-to-all)
        rows = shard(jnp.swapaxes(wire_lde, 1, 2), (1, "col"))
        digests = HP.hash_no_pad(rows)
        aux = perm_b(trace[:, :, :cfg.num_routed_wires], betas, gammas,
                     pre["tables"])
        aux_lde = coset_lde(ifft(shard(aux, (1, "col"))), cfg.rate_bits)
        quot = quot_b(wire_lde, aux_lde, pi_hash, betas, gammas, alphas,
                      pre["tables"])
        return digests, quot

    return jax.jit(core)


def sharded_ntt(mesh):
    """Batched negacyclic NTT with the batch sharded over every mesh
    device — the proofs/s-style scaling measurement for the NTT kernel."""
    from ..ntt import ntt_forward

    def fn(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(("dp", "col"), None)))
        return ntt_forward(x)

    return jax.jit(fn)
