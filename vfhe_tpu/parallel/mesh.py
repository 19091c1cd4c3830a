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


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join a multi-host JAX cluster (DCN across hosts, ICI within).

    Call once per process before any mesh/device use; afterwards
    ``jax.devices()`` spans every host and :func:`make_mesh` /
    :func:`make_host_mesh` build global meshes whose collectives ride
    ICI within a slice and DCN across hosts. Arguments default to the
    standard env vars (JAX_COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID) / TPU metadata that jax.distributed auto-detects.

    The reference has no distributed backend at all (SURVEY.md section
    5); this is the framework's NCCL/MPI-equivalent bootstrap, built on
    jax.distributed rather than a hand-rolled transport.
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_host_mesh(col_parallel: int = 1) -> Mesh:
    """Global (dp, col) mesh for a multi-host cluster, laid out so that
    ``col`` (which carries the all-to-all/transpose traffic of the
    column-sharded prover and the stage-exchange NTT) stays WITHIN a
    host's ICI domain, and only the embarrassingly-parallel ``dp`` axis
    crosses hosts over DCN."""
    per_host = jax.local_device_count()
    assert per_host % col_parallel == 0, \
        f"col_parallel {col_parallel} must divide local devices {per_host}"
    devs = np.array(jax.devices())          # grouped by process
    arr = devs.reshape(-1, col_parallel)    # dp = hosts * (local/col)
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
