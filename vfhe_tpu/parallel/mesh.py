"""Device-mesh helpers for multi-chip scaling.

The reference is single-process CPU (SURVEY.md section 2: "Parallelism /
distributed components: NONE") — its only concurrency is rayon inside
plonky2. Here scaling is structural: SPMD over a jax.sharding.Mesh.

Axes (the framework's analog of dp/tp):

* ``dp``  — independent proof instances (ciphertext batching): the IVC
  chain is sequential per ciphertext, but different ciphertexts' step
  proofs are embarrassingly parallel (SURVEY.md section 7).
* ``col`` — polynomial/trace columns within one proof (wire columns,
  quotient chunks, FRI codeword segments): column-parallel iFFT/LDE and
  row-sharded Merkle hashing.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, col_parallel: int = 1) -> Mesh:
    """(dp, col) mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), \
        f"asked for {n_devices} devices, have {len(devs)}"
    assert n_devices % col_parallel == 0
    dp = n_devices // col_parallel
    arr = np.array(devs[:n_devices]).reshape(dp, col_parallel)
    return Mesh(arr, ("dp", "col"))


def dp_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def col_sharding(mesh: Mesh, ndim: int, axis: int) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "col"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
