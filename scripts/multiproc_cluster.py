"""REAL multi-process cluster run: the distributed substrate crossing
an actual process boundary (VERDICT round 4, missing #3: "no
multi-process run has ever executed").

The environment has one host and one TPU chip, so this uses the CPU
backend: N processes x 2 virtual devices each, joined into one JAX
cluster by ``init_multihost`` (jax.distributed -> Gloo collectives —
the same code path that rides DCN between real hosts). What it proves:

1. ``init_multihost`` + ``make_host_mesh`` assemble the documented
   (dp, col) layout across processes: col stays inside a process's
   device group (the ICI domain), dp crosses the process boundary.
2. The stage-exchange dist-NTT runs with its all-to-alls CROSSING the
   process boundary (col axis spanning every device of every process)
   and is bit-exact vs the single-device kernel.
3. The (dp, col)-sharded batched step core (witness -> trace -> iFFT
   -> LDE -> Merkle leaves -> permutation -> quotient) executes across
   processes, dp spanning the boundary, bit-identical to the
   single-device core.

Usage:
  python scripts/multiproc_cluster.py            # parent: spawns 2 workers
  python scripts/multiproc_cluster.py --nproc 2  # explicit
(workers are spawned with --worker <pid> <nproc> <port>; don't run that
by hand).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 2


def worker(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from vfhe_tpu.parallel import init_multihost, make_host_mesh
    init_multihost(f"localhost:{port}", nproc, pid)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == nproc * LOCAL_DEVICES
    n_dev = jax.device_count()

    def log(msg):
        print(f"[proc {pid}] {msg}", flush=True)

    def barrier(name, timeout_s=1200):
        # coordination-service barrier (host-level, no device
        # collective): bounds inter-process divergence so a slow local
        # compile on one worker can't trip the peer's collective or
        # shutdown timeouts
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            name, timeout_in_ms=timeout_s * 1000)

    log(f"joined cluster: {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices")

    # 1. layout: col within a process, dp across processes
    mesh = make_host_mesh(col_parallel=LOCAL_DEVICES)   # (nproc, 2)
    assert mesh.shape["dp"] == nproc
    assert mesh.shape["col"] == LOCAL_DEVICES
    for row in mesh.devices:
        owners = {d.process_index for d in row}
        assert len(owners) == 1, "col axis crosses a process boundary"
    dp_owners = [row[0].process_index for row in mesh.devices]
    assert len(set(dp_owners)) == nproc, "dp axis does not cross processes"
    log("host-mesh layout ok (col intra-process, dp inter-process)")

    def to_global(a, m, spec):
        # every process holds the FULL array; hand jax the addressable
        # shards by slicing it (host_local_array_to_global_array would
        # wrongly CONCATENATE the per-process copies)
        sh = NamedSharding(m, spec)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    # 2. dist-NTT with the all-to-all CROSSING the process boundary
    from vfhe_tpu.parallel import make_dist_ntt
    from vfhe_tpu.ntt import ntt_forward, ntt_backward
    n = 1024
    mesh_col = Mesh(np.array(jax.devices()).reshape(1, n_dev),
                    ("dp", "col"))
    fw, bw = make_dist_ntt(mesh_col, n)
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 2**62, (8, n), dtype=np.uint64)
    xs_g = to_global(xs, mesh_col, P(None, "col"))

    def check_shards(x, want, what):
        # compare ONLY this process's addressable shards against the
        # locally-computed full reference: no extra cross-process
        # replication collective needed (a second Gloo executable for
        # the read-back proved flaky; the collectives under test are
        # the ones INSIDE the transforms)
        x.block_until_ready()
        for shard in x.addressable_shards:
            got = np.asarray(shard.data)
            assert (got == want[shard.index]).all(), \
                f"{what}: shard {shard.index} diverged"

    barrier("section2_ready")
    want = np.asarray(ntt_forward(jnp.asarray(xs)))
    check_shards(fw(xs_g), want, "dist-NTT fw")
    check_shards(bw(fw(xs_g)),
                 np.asarray(ntt_backward(jnp.asarray(want))),
                 "dist-NTT roundtrip")
    log("dist-NTT bit-exact with all-to-alls across the process boundary")
    barrier("dist_ntt_done")

    # 3. the (dp, col)-sharded step core across processes
    from vfhe_tpu.circuit import TEST_CONFIG
    from vfhe_tpu.ivc import TEST_PARAMS, get_step_circuit
    from vfhe_tpu.parallel import make_step_core, make_batched_step_core
    sc = get_step_circuit(TEST_PARAMS, TEST_CONFIG)
    barrier("circuit_built")        # build times diverge by minutes
    B = nproc                       # one instance per dp row
    step = make_batched_step_core(sc.data, mesh)
    w0 = rng.integers(0, 2**63, (B, sc.data.num_targets + 1),
                      dtype=np.uint64)
    ch = rng.integers(1, 2**62, (3, B, 2), dtype=np.uint64)
    pi_hash = np.zeros((B, 4), dtype=np.uint64)
    w0_g = to_global(w0, mesh, P("dp", None))
    args_g = [to_global(a, mesh, P(*([None] * a.ndim)))
              for a in (*ch, pi_hash)]
    with mesh:
        digests, quot = step(w0_g, *args_g)

    # single-device reference on the local backend, compared against
    # this process's addressable shards of the global outputs
    core = make_step_core(sc.data)
    d_ref = np.stack([np.asarray(core(
        jnp.asarray(w0[b]), jnp.asarray(ch[0, b]), jnp.asarray(ch[1, b]),
        jnp.asarray(ch[2, b]), jnp.asarray(pi_hash[b]))[0])
        for b in range(B)])
    q_ref = np.stack([np.asarray(core(
        jnp.asarray(w0[b]), jnp.asarray(ch[0, b]), jnp.asarray(ch[1, b]),
        jnp.asarray(ch[2, b]), jnp.asarray(pi_hash[b]))[1])
        for b in range(B)])
    check_shards(digests, d_ref, "step-core digests")
    check_shards(quot, q_ref, "step-core quotient")
    log(f"(dp,col) step core bit-identical across {nproc} processes "
        f"({B} instances, digests {digests.shape})")
    # lockstep exit: the circuit build / local compiles can diverge by
    # minutes between processes under load, and a worker exiting early
    # trips the coordination service's 60 s shutdown barrier and kills
    # the slow worker mid-section
    barrier("worker_done")
    print(f"MULTIPROC OK pid={pid}", flush=True)
    jax.distributed.shutdown()


def main() -> int:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
               int(sys.argv[i + 3]))
        return 0
    nproc = 2
    if "--nproc" in sys.argv:
        nproc = int(sys.argv[sys.argv.index("--nproc") + 1])
    import socket
    import subprocess
    with socket.socket() as s:        # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(pid), str(nproc), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=1500)
        sys.stdout.write(out)
        if p.returncode != 0 or f"MULTIPROC OK pid={pid}" not in out:
            ok = False
    print("CLUSTER OK" if ok else "CLUSTER FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
