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
        w = sc_data.witness_fn(w0)
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
    """vmap the per-instance core over a leading batch axis and shard it
    over the mesh's dp axis."""
    core = make_step_core(sc_data)
    batched = jax.vmap(core, in_axes=(0, 0, 0, 0, 0))

    def sharded(w0_batch, betas, gammas, alphas, pi_hash):
        w0_batch = jax.lax.with_sharding_constraint(
            w0_batch, NamedSharding(mesh, P("dp", None)))
        return batched(w0_batch, betas, gammas, alphas, pi_hash)

    return jax.jit(sharded)


def sharded_ntt(mesh):
    """Batched negacyclic NTT with the batch sharded over every mesh
    device — the proofs/s-style scaling measurement for the NTT kernel."""
    from ..ntt import ntt_forward

    def fn(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(("dp", "col"), None)))
        return ntt_forward(x)

    return jax.jit(fn)
