"""Test harness config: run everything on a simulated 8-device CPU mesh.

The real target is TPU, but tests must be fast and deterministic and must
exercise the multi-device sharding paths, so we force the CPU backend with
8 virtual XLA devices (SURVEY.md section 4, "Implication for the TPU
framework's test strategy").

NOTE: this must run before any jax backend is initialized. The axon TPU
plugin registers itself via sitecustomize at interpreter start, but the
platform *selection* can still be overridden via jax.config here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# The suite loads MANY circuits per process; the raw-PJRT witness-fn
# executable cache segfaults on cross-module symbol clashes in exactly
# that situation (see compile.py _resolve). The jax compile cache below
# still dedupes the XLA compiles.
os.environ["VFHE_WFN_EXE_CACHE"] = "0"

# A full-suite process accumulates ~40k+ mmap regions (hundreds of
# XLA:CPU executables + their constant buffers); the kernel default
# vm.max_map_count=65530 is then exhausted mid-compile of the big
# recursive-verifier witness and the process dies with an
# uncatchable SIGSEGV/abort (three such crashes diagnosed round 4 —
# at cache read, at backend_compile, at executable load). Raise the
# limit BEFORE running:  sysctl -w vm.max_map_count=1048576
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _mmc = int(_f.read())
    if _mmc < 200_000:
        import warnings
        warnings.warn(
            f"vm.max_map_count={_mmc} is too low for the full suite "
            "(it exhausts ~40k+ maps and SEGFAULTS at the "
            "recursive-verifier tests). Run: "
            "sysctl -w vm.max_map_count=1048576", stacklevel=0)
except OSError:
    pass

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: tiny uint64 kernels dominate wall time
# otherwise. The dir is keyed on the host CPU's feature flags: XLA:CPU
# AOT entries compiled on a DIFFERENT machine SIGILL/SEGV when loaded
# (a previous round's cache segfaulted this suite mid-run).
from vfhe_tpu import _host_cpu_fingerprint

jax.config.update("jax_compilation_cache_dir",
                  f"/root/.cache/jax_vfhe_{_host_cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x60401DC5)
