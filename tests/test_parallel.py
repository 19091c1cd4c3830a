"""Multi-device tests on the simulated 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.ntt import ntt_forward
from vfhe_tpu.parallel import make_mesh, make_batched_step_core, sharded_ntt


def test_mesh_shape():
    mesh = make_mesh(8, col_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "col")


def test_sharded_ntt_matches_single(rng):
    mesh = make_mesh(8)
    f = sharded_ntt(mesh)
    x = jnp.asarray(rng.integers(0, gl.P, (16, 64), dtype=np.uint64))
    with mesh:
        got = np.asarray(f(x))
    want = np.asarray(ntt_forward(x))
    assert (got == want).all()


def test_batched_step_core_sharded(rng):
    from vfhe_tpu.circuit import TEST_CONFIG
    from vfhe_tpu.ivc import TEST_PARAMS, get_step_circuit

    sc = get_step_circuit(TEST_PARAMS, TEST_CONFIG)
    mesh = make_mesh(8)
    step = jax.jit(make_batched_step_core(sc.data, mesh))
    B = 8
    w0 = jnp.asarray(rng.integers(0, 2**62, (B, sc.data.num_targets + 1),
                                  dtype=np.uint64))
    ch = jnp.asarray(rng.integers(1, 2**62, (3, B, 2), dtype=np.uint64))
    pi_hash = jnp.zeros((B, 4), jnp.uint64)
    with mesh:
        digests, quot = step(w0, ch[0], ch[1], ch[2], pi_hash)
    assert digests.shape == (B, sc.data.h << TEST_CONFIG.rate_bits, 4)
    assert quot.shape[0] == B
    # batched result matches per-instance run
    from vfhe_tpu.parallel import make_step_core
    core = make_step_core(sc.data)
    d0, q0 = core(w0[3], ch[0, 3], ch[1, 3], ch[2, 3], pi_hash[3])
    assert (np.asarray(digests[3]) == np.asarray(d0)).all()
    assert (np.asarray(quot[3]) == np.asarray(q0)).all()
