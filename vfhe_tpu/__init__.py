"""vfhe_tpu — a TPU-native verifiable-FHE (vPBS) prover framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
zama-ai/verifiable-fhe-paper (mounted read-only at /root/reference):
proving correct execution of TFHE's programmable bootstrapping with a
plonky2-style FRI/PLONK proof system over the Goldilocks field, driven
as batched, jit-compiled tensor programs on TPU.

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

    vfhe_tpu.field      Goldilocks + quadratic extension kernels (ref: plonky2 field)
    vfhe_tpu.ntt        negacyclic NTT kernels + parameter tables (ref: src/ntt)
    vfhe_tpu.crypto     native TFHE layer: witness generator / test oracle
                        (ref: src/vtfhe/crypto)
    vfhe_tpu.hashing    Poseidon permutation / hashing (ref: plonky2 PoseidonHash)
    vfhe_tpu.circuit    circuit builder: targets, ops, witness generation
                        (ref: plonky2 CircuitBuilder API surface)
    vfhe_tpu.gadgets    ciphertexts-of-targets gadget layer (ref: src/vtfhe/*.rs,
                        src/vec_arithmetic.rs)
    vfhe_tpu.prover     FRI polynomial commitment + PLONK-style prover/verifier
                        (ref: plonky2 prover; rebuilt as batched JAX kernels)
    vfhe_tpu.ivc        the vPBS step protocol, proof chaining and verification
                        (ref: src/vtfhe/ivc_based_vpbs.rs)
    vfhe_tpu.parallel   device-mesh sharding of NTT / FRI / Merkle work
    vfhe_tpu.utils      timing trees, logging, config
"""

import os as _os

import jax as _jax

# The whole framework computes in uint64 Goldilocks arithmetic; 64-bit types
# must be enabled before any jax array is created.
_jax.config.update("jax_enable_x64", True)

# Persistent compile cache: prover kernels are compiled once per circuit
# shape, and (remote) TPU compiles are expensive — cache them across
# processes unless the user already configured a cache.


def _host_cpu_fingerprint() -> str:
    """Cache-dir suffix tied to the host CPU's feature set. XLA:CPU AOT
    cache entries encode the COMPILE machine's features; loading them on
    a host without those features SIGILL/SEGVs (observed: a stale cache
    from a previous sandbox machine segfaulted the test suite mid-run).
    Keying the dir on the feature flags makes a new machine start clean
    instead of crashing."""
    try:
        import hashlib
        import re
        txt = open("/proc/cpuinfo").read()
        m = re.search(r"^flags\s*:\s*(.*)$", txt, re.M)
        if m:
            return hashlib.sha1(m.group(1).encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


if _jax.config.jax_compilation_cache_dir is None:
    # TPU binaries from the remote compile service are host-independent
    # -> one shared warm dir. CPU (in-process AOT) entries are host-CPU-
    # specific -> fingerprinted dir, fresh on a new machine.
    # (the axon plugin registers as "axon,cpu" — only a pure-cpu
    # selection means the in-process CPU backend will run the kernels)
    _plats = str(getattr(_jax.config, "jax_platforms", "") or "")
    if _plats.split(",")[0].strip() == "cpu":
        _cache_dir = f"~/.cache/vfhe_tpu_jax_cpu_{_host_cpu_fingerprint()}"
    else:
        _cache_dir = "~/.cache/vfhe_tpu_jax"
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API: vfhe_tpu.crypto, vfhe_tpu.prover, ... without
    # importing the whole stack at package import
    import importlib
    if name in ("field", "ntt", "crypto", "hashing", "circuit", "gadgets",
                "prover", "ivc", "parallel", "utils", "runtime"):
        return importlib.import_module(f"vfhe_tpu.{name}")
    raise AttributeError(name)
