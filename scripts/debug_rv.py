"""One-off debugging driver for the in-circuit verifier (round-2 WIP).

Caches the inner proof in /tmp so iteration on the outer circuit is
seconds, then maps failing ARITH lanes back to builder chunks/targets.
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.prover import prove, preprocess, verify
from vfhe_tpu.prover.debug import check_witness_vector
from vfhe_tpu.ivc.proof_target import ProofShape, ProofTarget
from vfhe_tpu.ivc.verifier_circuit import verify_proof_circuit

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_recursive_verifier import _build_inner, INNER_CONFIG

CACHE = "/tmp/inner_proof.pkl"


def get_inner():
    data, xs, sel = _build_inner()
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            proof, vk = pickle.load(f)
    else:
        pw = PartialWitness()
        pw.set_target_arr(xs, np.arange(1, 9, dtype=np.uint64) * 12345)
        pw.set_bool_target(sel, True)
        proof = prove(data, pw)
        vk = preprocess(data)["vk"]
        verify(vk, proof)
        with open(CACHE, "wb") as f:
            pickle.dump((proof, vk), f)
    return data, proof, vk


def build_outer_raw(inner_data):
    """Like tests._build_outer but returns the *builder* too (pre-build
    introspection) by deferring build."""
    shape = ProofShape(config=inner_data.config, h=inner_data.h,
                       num_pis=len(inner_data.pi_targets),
                       num_selectors=len(inner_data.gates))
    b = CircuitBuilder(TEST_CONFIG)
    b._dbg = {}
    cond = b.add_virtual_bool_target_safe()
    pt = ProofTarget.allocate(b, shape)
    cap = shape.cap_size
    vk_cap = b.add_virtual_targets(cap * 4).reshape(cap, 4)
    vk_digest = b.add_virtual_targets(4)
    verify_proof_circuit(b, shape, inner_data.gates, pt, vk_cap, vk_digest,
                         cond)
    return b, shape, pt, cond, vk_cap, vk_digest


def arith_row_map(b, zero_t):
    """Replicate compile.py's ARITH row layout: returns list of
    (row_index_offset, k0, k1, a, b, c, out arrays per row)."""
    from vfhe_tpu.circuit.builder import ARITH_LANES
    rows = []
    for (k0, k1), chunks in sorted(b._arith_groups.items()):
        # also track chunk id per lane
        a = np.concatenate([c[0] for c in chunks])
        bb = np.concatenate([c[1] for c in chunks])
        c_ = np.concatenate([c[2] for c in chunks])
        out = np.concatenate([c[3] for c in chunks])
        chunk_of = np.concatenate(
            [np.full(c[0].size, ci) for ci, c in enumerate(chunks)])
        lanes = a.size
        nrows = -(-lanes // ARITH_LANES)
        padn = nrows * ARITH_LANES - lanes
        if padn:
            zpad = np.full(padn, zero_t, dtype=np.int64)
            a, bb, c_, out = (np.concatenate([x, zpad])
                              for x in (a, bb, c_, out))
            chunk_of = np.concatenate([chunk_of, np.full(padn, -1)])
        for r in range(nrows):
            s = r * ARITH_LANES
            rows.append((k0, k1, a[s:s + 20], bb[s:s + 20], c_[s:s + 20],
                         out[s:s + 20], chunk_of[s:s + 20]))
    return rows


def main():
    inner_data, proof, vk = get_inner()
    b, shape, pt, cond, vk_cap, vk_digest = build_outer_raw(inner_data)
    import copy as _c
    groups_snapshot = {k: list(v) for k, v in b._arith_groups.items()}
    zero_t = b.constant(0)
    data = b.build()

    pw = PartialWitness()
    pw.set_bool_target(cond, True)
    pt.assign(pw, proof)
    pw.set_target_arr(vk_cap, vk.preproc_cap)
    pw.set_target_arr(vk_digest, vk.circuit_digest)
    w = np.asarray(data.eval_witness(pw))
    failures = check_witness_vector(data, w, max_report=50)
    print(f"{len(failures)} failures")
    for f in failures:
        print(" ", f)

    # map ARITH failures to lanes
    rows = arith_row_map(b, zero_t)
    import re
    for f in failures:
        m = re.match(r"gate ARITH\(p=0\) constraint (\d+) row (\d+)", f)
        if not m:
            continue
        lane, row = int(m.group(1)), int(m.group(2))
        k0, k1, a, bb, c_, out, chunk_of = rows[row]
        ta, tb, tc, to = a[lane], bb[lane], c_[lane], out[lane]
        print(f"row {row} lane {lane}: k0={k0} k1={k1} chunk={chunk_of[lane]}"
              f" a=t{ta}({w[ta]}) b=t{tb}({w[tb]}) c=t{tc}({w[tc]})"
              f" out=t{to}({w[to]})")
        want = (k0 * int(w[ta]) * int(w[tb]) + k1 * int(w[tc])) % gl.P
        print(f"   expected out = {want}")

    # ---- native recomputation of the PLONK identity intermediates ------
    from vfhe_tpu.field import host as hf
    from vfhe_tpu.hashing import poseidon as HP
    from vfhe_tpu.prover.challenger import Challenger
    from vfhe_tpu.prover.constraints import eval_gate
    import jax.numpy as jnp

    dbg = b._dbg
    cfg = inner_data.config
    S_ = len(inner_data.gates)
    R = cfg.num_routed_wires
    chunk = cfg.perm_chunk_size
    n_chunks = -(-R // chunk)
    per_ch = 1 + n_chunks

    pi_hash = np.asarray(HP.hash_no_pad_jit(jnp.asarray(proof.public_inputs)))
    ch = Challenger()
    ch.observe(vk.circuit_digest)
    ch.observe(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.sample_array(cfg.num_challenges)
    gammas = ch.sample_array(cfg.num_challenges)
    ch.observe_cap(proof.aux_cap)
    alphas = ch.sample_array(cfg.num_challenges)
    ch.observe_cap(proof.quotient_cap)
    zeta = hf.from_array(ch.sample_ext())

    def wv(tgts):
        return np.asarray(w)[np.asarray(tgts, dtype=np.int64)]

    print("zeta circuit:", wv(dbg["zeta"]), "native:", zeta)
    print("betas circuit:", wv(dbg["betas"]), "native:", betas)
    print("alphas circuit:", wv(dbg["alphas"]), "native:", alphas)
    print("pi_hash circuit:", wv(dbg["pi_hash"]), "native:", pi_hash)

    open_pre, open_w, open_aux, open_q = proof.openings
    sels = [hf.from_array(open_pre.at_zeta[i]) for i in range(S_)]
    consts = [hf.from_array(open_pre.at_zeta[S_ + R + i]) for i in range(4)]
    wires = [hf.from_array(open_w.at_zeta[i])
             for i in range(open_w.at_zeta.shape[0])]
    pi_cols = [hf.ext(int(x)) for x in pi_hash]
    terms = []
    term_gate = []
    for gi, gate in enumerate(inner_data.gates):
        cs = eval_gate(gate, hf.HostExtOps, wires, consts, pi_cols)
        terms.extend(hf.mul(sels[gi], c) for c in cs)
        term_gate.extend([gi] * len(cs))

    cg = wv(dbg["filtered"])
    print(f"native terms: {len(terms)}, circuit terms: {cg.shape[0]}")
    nbad = 0
    for i, t in enumerate(terms):
        cv = tuple(int(x) for x in cg[i])
        if cv != tuple(t):
            if nbad < 12:
                print(f"  term {i} (gate {term_gate[i]} kind "
                      f"{inner_data.gates[term_gate[i]].kind}): "
                      f"circuit {cv} native {tuple(t)}")
            nbad += 1
    print(f"{nbad} filtered-term mismatches of {len(terms)}")
    for i in range(cfg.num_challenges):
        d = dbg[f"ch{i}"]
        print(f"ch{i}: acc={wv(d['acc'])} rhs={wv(d['rhs'])} "
              f"l1={wv(d['l1'])} zh={wv(d['zh'])}")


if __name__ == "__main__":
    main()
