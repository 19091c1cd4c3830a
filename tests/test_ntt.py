"""NTT bit-exactness tests against the reference's committed vectors.

The reference commits deterministic Sage-generated vectors TESTG/TESTGHAT
for every N in {8..2048} (src/ntt/params_8.rs:11-13 and siblings) and both
its circuit NTT and native NTT must reproduce them (src/ntt/mod.rs:82-136,
src/vtfhe/crypto/poly.rs:194-208). Ours must too — for ALL committed N.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.ntt import get_params, ntt_forward, ntt_backward, negacyclic_mul

from golden_ntt import GOLDEN

# reference tables for N=8, transcribed from src/ntt/params_8.rs:1-7
REF_N8_NINV = 16140901060737761281
REF_N8_ROOTS = [1, 281474976710656, 18446744069397807105, 18446742969902956801,
                17293822564807737345, 4096, 4503599626321920, 18446744000695107585]
REF_N8_INVROOTS = [1, 18446462594437873665, 1099511627520, 16777216,
                   68719476736, 18442240469788262401, 18446744069414580225,
                   1152921504606846976]


def test_param_tables_match_reference():
    p = get_params(8)
    assert p.ninv == REF_N8_NINV
    assert p.roots.tolist() == REF_N8_ROOTS
    assert p.invroots.tolist() == REF_N8_INVROOTS


@pytest.mark.parametrize("n", sorted(GOLDEN))
def test_golden_forward_backward(n):
    testg, testghat = GOLDEN[n]
    g = jnp.asarray(np.array(testg, dtype=np.uint64))
    ghat = jnp.asarray(np.array(testghat, dtype=np.uint64))

    assert np.asarray(ntt_forward(g)).tolist() == testghat
    assert np.asarray(ntt_backward(ghat)).tolist() == testg


def test_batched_matches_single(rng):
    n = 64
    batch = rng.integers(0, gl.P, (5, 3, n), dtype=np.uint64)
    full = np.asarray(ntt_forward(jnp.asarray(batch)))
    for i in range(5):
        for j in range(3):
            single = np.asarray(ntt_forward(jnp.asarray(batch[i, j])))
            assert (full[i, j] == single).all()


def test_roundtrip(rng):
    for n in [8, 32, 256]:
        a = jnp.asarray(rng.integers(0, gl.P, (4, n), dtype=np.uint64))
        back = np.asarray(ntt_backward(ntt_forward(a)))
        assert (back == np.asarray(a)).all()


def test_negacyclic_mul_schoolbook(rng):
    n = 16
    a = rng.integers(0, gl.P, n, dtype=np.uint64)
    b = rng.integers(0, gl.P, n, dtype=np.uint64)
    got = np.asarray(negacyclic_mul(jnp.asarray(a), jnp.asarray(b)))

    # schoolbook negacyclic convolution in python ints
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            term = int(a[i]) * int(b[j])
            if k >= n:
                want[k - n] = (want[k - n] - term) % gl.P
            else:
                want[k] = (want[k] + term) % gl.P
    assert [int(x) for x in got] == want
