"""Compact binary proof serialization.

The reference only serializes for size logging (proof.to_bytes(),
ivc_based_vpbs.rs:488); here serialization also powers step-granular
checkpoint/resume of the PBS chain (SURVEY.md section 5: the IVC chain
state is just the latest proof). Format: a little-endian u64 stream with
a small header — no pickle, loadable anywhere.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from .prove import OracleOpening, Proof, QueryOpening
from . import fri

MAGIC = b"VFHEPRF1"


def _w_arr(buf, arr):
    arr = np.ascontiguousarray(arr, dtype=np.uint64)
    buf.write(struct.pack("<B", arr.ndim))
    for d in arr.shape:
        buf.write(struct.pack("<I", d))
    buf.write(arr.tobytes())


def _r_arr(buf):
    (ndim,) = struct.unpack("<B", buf.read(1))
    shape = tuple(struct.unpack("<I", buf.read(4))[0] for _ in range(ndim))
    n = int(np.prod(shape)) if shape else 1
    data = np.frombuffer(buf.read(8 * n), dtype="<u8").reshape(shape)
    return data.astype(np.uint64)


def proof_to_bytes(p: Proof) -> bytes:
    buf = io.BytesIO()
    buf.write(MAGIC)
    _w_arr(buf, p.public_inputs)
    _w_arr(buf, p.wires_cap)
    _w_arr(buf, p.aux_cap)
    _w_arr(buf, p.quotient_cap)
    buf.write(struct.pack("<I", len(p.openings)))
    for o in p.openings:
        _w_arr(buf, o.at_zeta)
        _w_arr(buf, o.at_gzeta)
    buf.write(struct.pack("<I", len(p.fri_caps)))
    for c in p.fri_caps:
        _w_arr(buf, c)
    _w_arr(buf, p.fri_final_coeffs)
    buf.write(struct.pack("<Q", p.pow_witness))
    _w_arr(buf, np.asarray(p.query_indices, dtype=np.uint64))
    buf.write(struct.pack("<I", len(p.query_openings)))
    for q in p.query_openings:
        buf.write(struct.pack("<I", len(q.leaves)))
        for leaf, sibs in zip(q.leaves, q.siblings):
            _w_arr(buf, leaf)
            buf.write(struct.pack("<I", len(sibs)))
            for s in sibs:
                _w_arr(buf, s)
    buf.write(struct.pack("<I", len(p.fri_query_rounds)))
    for r in p.fri_query_rounds:
        buf.write(struct.pack("<I", len(r.layers)))
        for layer in r.layers:
            _w_arr(buf, layer.leaf)
            buf.write(struct.pack("<I", len(layer.siblings)))
            for s in layer.siblings:
                _w_arr(buf, s)
    return buf.getvalue()


def proof_from_bytes(data: bytes) -> Proof:
    buf = io.BytesIO(data)
    assert buf.read(8) == MAGIC, "bad proof magic"
    public_inputs = _r_arr(buf)
    wires_cap = _r_arr(buf)
    aux_cap = _r_arr(buf)
    quotient_cap = _r_arr(buf)
    (n_open,) = struct.unpack("<I", buf.read(4))
    openings = [OracleOpening(_r_arr(buf), _r_arr(buf))
                for _ in range(n_open)]
    (n_caps,) = struct.unpack("<I", buf.read(4))
    fri_caps = [_r_arr(buf) for _ in range(n_caps)]
    fri_final = _r_arr(buf)
    (pow_witness,) = struct.unpack("<Q", buf.read(8))
    query_indices = _r_arr(buf).astype(np.int64)
    (n_q,) = struct.unpack("<I", buf.read(4))
    query_openings = []
    for _ in range(n_q):
        (n_or,) = struct.unpack("<I", buf.read(4))
        leaves, sibs = [], []
        for _ in range(n_or):
            leaves.append(_r_arr(buf))
            (n_s,) = struct.unpack("<I", buf.read(4))
            sibs.append([_r_arr(buf) for _ in range(n_s)])
        query_openings.append(QueryOpening(leaves=leaves, siblings=sibs))
    (n_fr,) = struct.unpack("<I", buf.read(4))
    fri_rounds = []
    for _ in range(n_fr):
        (n_l,) = struct.unpack("<I", buf.read(4))
        layers = []
        for _ in range(n_l):
            leaf = _r_arr(buf)
            (n_s,) = struct.unpack("<I", buf.read(4))
            layers.append(fri.FriLayerOpening(
                leaf=leaf, siblings=[_r_arr(buf) for _ in range(n_s)]))
        fri_rounds.append(fri.FriQueryRound(layers=layers))
    return Proof(public_inputs=public_inputs, wires_cap=wires_cap,
                 aux_cap=aux_cap, quotient_cap=quotient_cap,
                 openings=openings, fri_caps=fri_caps,
                 fri_final_coeffs=fri_final, pow_witness=pow_witness,
                 query_indices=query_indices,
                 query_openings=query_openings,
                 fri_query_rounds=fri_rounds)
