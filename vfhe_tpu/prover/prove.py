"""The PLONK/FRI prover: trace commit, permutation argument, quotient, FRI.

Rebuild of plonky2's ``prove()`` (the function the reference calls n+2
times per PBS, ivc_based_vpbs.rs:302/333/364) as a batched JAX pipeline:

  witness gen (one jit fn)  ->  trace gather  ->  column iFFT + coset LDE
  ->  Merkle caps  ->  permutation Z / partial products  ->  vectorized
  constraint evaluation on the LDE coset  ->  quotient  ->  openings at
  zeta  ->  FRI batch opening proof.

Every heavy stage is compiled ONCE per circuit (cached on the
CircuitData) and batched over rows/columns, so the same code path later
shards across a device mesh (vfhe_tpu.parallel). Inversions inside the
pipeline use parallel Fermat chains (no sequential scan) — the
TPU-friendly choice.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as ee
from ..circuit.compile import CircuitData, PartialWitness
from ..hashing import poseidon as HP
from . import fri, merkle
from .challenger import Challenger
from .constraints import eval_gate_stacked
from .fft import coset_lde, eval_poly_ext_jit, fft, ifft, COSET_SHIFT


@dataclass
class OracleOpening:
    at_zeta: np.ndarray    # (num_cols, 2)
    at_gzeta: np.ndarray   # (num_cols, 2)


@dataclass
class QueryOpening:
    leaves: list           # per main oracle: (num_cols,) base values
    siblings: list         # per main oracle: merkle path


@dataclass
class Proof:
    public_inputs: np.ndarray
    wires_cap: np.ndarray
    aux_cap: np.ndarray
    quotient_cap: np.ndarray
    openings: list         # [OracleOpening] for preproc/wires/aux/quotient
    fri_caps: list
    fri_final_coeffs: np.ndarray
    pow_witness: int
    query_indices: np.ndarray
    query_openings: list   # [QueryOpening] per query
    fri_query_rounds: list

    def num_bytes(self) -> int:
        from .serialize import proof_to_bytes
        return len(proof_to_bytes(self))


@dataclass
class VerifierKey:
    config: object
    h: int
    gates: list
    k_cosets: np.ndarray
    num_pis: int
    preproc_cap: np.ndarray
    circuit_digest: np.ndarray
    num_preproc: int


# ---------------------------------------------------------------------------
# cached host-side tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pow_table(base: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = gl.h_mul(acc, base)
    return out


def _domain_pows(h: int) -> np.ndarray:
    return _pow_table(gl.primitive_root_of_unity(h), h)


@functools.lru_cache(maxsize=None)
def _coset_pts_impl(n: int) -> np.ndarray:
    k = gl.primitive_root_of_unity(n)
    out = np.empty(n, dtype=np.uint64)
    acc = COSET_SHIFT
    for i in range(n):
        out[i] = acc
        acc = gl.h_mul(acc, k)
    return out


@functools.lru_cache(maxsize=None)
def _zh_inv_on_coset(h: int, rate_bits: int) -> np.ndarray:
    """1 / (x^h - 1) on the LDE coset; periodic with period 2^rate_bits."""
    k = gl.primitive_root_of_unity(h << rate_bits)
    kh = gl.h_pow(k, h)
    sh = gl.h_pow(COSET_SHIFT, h)
    vals = []
    acc = sh
    for _ in range(1 << rate_bits):
        vals.append(gl.h_inv((acc - 1) % gl.P))
        acc = gl.h_mul(acc, kh)
    return np.tile(np.array(vals, dtype=np.uint64), h)


@functools.lru_cache(maxsize=None)
def _inv_shift_powers(n: int) -> np.ndarray:
    return _pow_table(gl.h_inv(COSET_SHIFT), n)


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------

def _column_tree(lde_cols: jnp.ndarray, cap_height: int):
    return merkle.build(jnp.transpose(lde_cols), cap_height=cap_height)


def preprocess(data: CircuitData):
    """Preprocessed commitment (selectors | sigmas | constants) + verifier
    key + per-circuit compiled kernels. Cached on the CircuitData."""
    if "preproc" in data.prover_cache:
        return data.prover_cache["preproc"]
    cfg = data.config
    cols = np.concatenate([
        data.selectors.astype(np.uint64),
        data.sigma_vals,
        data.row_consts.T,
    ], axis=0)
    coeffs = ifft(jnp.asarray(cols))
    lde = coset_lde(coeffs, cfg.rate_bits)
    tree = _column_tree(lde, cfg.cap_height)
    digest = np.asarray(HP.hash_no_pad_jit(jnp.asarray(np.concatenate([
        np.asarray(tree.cap).ravel(),
        np.array([data.h, len(data.gates), cfg.num_wires,
                  cfg.num_routed_wires], dtype=np.uint64)]))))
    vk = VerifierKey(config=cfg, h=data.h, gates=data.gates,
                     k_cosets=data.k_cosets, num_pis=len(data.pi_targets),
                     preproc_cap=np.asarray(tree.cap), circuit_digest=digest,
                     num_preproc=cols.shape[0])
    out = dict(coeffs=coeffs, lde=lde, tree=tree, vk=vk,
               tables=_make_tables(data, lde),
               perm_fn=_make_perm_fn(data),
               quotient_fn=_make_quotient_fn(data, lde),
               codeword_fn=_make_codeword_fn())
    data.prover_cache["preproc"] = out
    return out


# ---------------------------------------------------------------------------
# permutation argument
# ---------------------------------------------------------------------------

def _ext_inv_vec(dv: jnp.ndarray) -> jnp.ndarray:
    """Elementwise extension inverse on (..., 2) via norms (parallel)."""
    norm = gl.sub(gl.square(dv[..., 0]),
                  gl.mul(jnp.uint64(ee.W), gl.square(dv[..., 1])))
    ninv = gl.inv(norm)
    return jnp.stack([gl.mul(dv[..., 0], ninv),
                      gl.mul(gl.neg(dv[..., 1]), ninv)], axis=-1)


@jax.jit
def _tables_device(pts, zh_inv, k_cosets, g_pows, h_inv):
    zh = gl.inv(zh_inv)
    l1 = gl.mul(gl.mul(zh, gl.inv(gl.sub(pts, jnp.uint64(1)))), h_inv)
    return dict(
        l1=l1,
        ident_h=gl.mul(k_cosets[None, :], g_pows[:, None]),
        ident_n=gl.mul(k_cosets[:, None], pts[None, :]),
    )


def _make_tables(data: CircuitData, pre_lde: jnp.ndarray) -> dict:
    """Device-resident constant tables, passed as ARGUMENTS to the jitted
    prover kernels. Closing over multi-hundred-MB constants instead makes
    XLA attempt compile-time constant folding over them (observed as
    pathological compile times at h=2^15). Computed in one jit call (each
    eager op would be its own remote compile)."""
    cfg = data.config
    h = data.h
    n = h << cfg.rate_bits
    S = len(data.gates)
    R = cfg.num_routed_wires
    pts = jnp.asarray(_coset_pts_impl(n))
    zh_inv = jnp.asarray(_zh_inv_on_coset(h, cfg.rate_bits))
    dev = _tables_device(pts, zh_inv, jnp.asarray(data.k_cosets),
                         jnp.asarray(_domain_pows(h)),
                         jnp.uint64(gl.h_inv(h % gl.P)))
    return dict(
        pts=pts,
        zh_inv=zh_inv,
        l1=dev["l1"],
        ident_h=dev["ident_h"],
        ident_n=dev["ident_n"],
        unscale=jnp.asarray(_inv_shift_powers(n)),
        sigma_T=jnp.asarray(data.sigma_vals.T),
        sel_lde=pre_lde[:S],
        sigma_lde=pre_lde[S:S + R],
        const_lde=pre_lde[S + R:],
    )


def _make_perm_fn(data: CircuitData):
    cfg = data.config
    h = data.h
    R = cfg.num_routed_wires
    chunk = cfg.perm_chunk_size
    n_chunks = -(-R // chunk)

    def fn(routed_vals, betas, gammas, tables):
        ident = tables["ident_h"]
        sigma_T = tables["sigma_T"]
        out = []
        for i in range(cfg.num_challenges):
            beta, gamma = betas[i], gammas[i]
            num = gl.add(gl.add(routed_vals, gl.mul(beta, ident)), gamma)
            den = gl.add(gl.add(routed_vals, gl.mul(beta, sigma_T)), gamma)
            ratio = gl.mul(num, gl.inv(den))          # parallel Fermat
            chunk_prods = []
            acc = jnp.ones((h,), jnp.uint64)
            for ci in range(n_chunks):
                part = ratio[:, ci * chunk:(ci + 1) * chunk]
                for j in range(part.shape[1]):
                    acc = gl.mul(acc, part[:, j])
                chunk_prods.append(acc)
            row_prod = chunk_prods[-1]

            def scan_z(carry, rp):
                return gl.mul(carry, rp), carry

            _, z = jax.lax.scan(scan_z, jnp.uint64(1), row_prod)
            out.append(z)
            for ci in range(n_chunks):
                out.append(gl.mul(z, chunk_prods[ci]))
        return jnp.stack(out, axis=0)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# quotient
# ---------------------------------------------------------------------------

def _make_quotient_fn(data: CircuitData, pre_lde: jnp.ndarray):
    """Constraint evaluation + quotient, streamed over domain segments.

    The naive form stacks every filtered constraint over the whole LDE
    domain (~600 columns x n points — multi-GB at h=2^15), so the domain
    is processed in segments under lax.map: one compiled segment body,
    bounded memory, identical results.
    """
    cfg = data.config
    h = data.h
    n = h << cfg.rate_bits
    R = cfg.num_routed_wires
    chunk = cfg.perm_chunk_size
    n_chunks = -(-R // chunk)
    gates = list(data.gates)
    pad_cols = n_chunks * chunk - R
    per_ch = 1 + n_chunks
    # segment count: keep segments >= 2^14 points and <= 64 segments
    n_seg = max(1, min(64, n // (1 << 14)))
    assert n % n_seg == 0
    m = n // n_seg

    def _chunk_prods(mat):
        if pad_cols:
            mat = jnp.concatenate(
                [mat, jnp.ones((pad_cols, mat.shape[1]), jnp.uint64)], axis=0)
        mm = mat.reshape(n_chunks, chunk, -1)
        acc = mm[:, 0]
        for j in range(1, chunk):
            acc = gl.mul(acc, mm[:, j])
        return acc

    def _segment(seg):
        (w_seg, aux_seg, auxn_seg, sel_seg, sig_seg, const_seg, ident_seg,
         zhinv_seg, l1_seg, pi_hash, betas, gammas, alphas) = seg
        blocks = []
        for gi, gate in enumerate(gates):
            cs = eval_gate_stacked(gate, w_seg, const_seg, pi_hash)
            blocks.append(gl.mul(sel_seg[gi][None, :], cs))
        gate_terms = jnp.concatenate(blocks, axis=0)

        outs = []
        for i in range(cfg.num_challenges):
            beta, gamma, alpha = betas[i], gammas[i], alphas[i]
            z = aux_seg[i * per_ch]
            partials = aux_seg[i * per_ch + 1:(i + 1) * per_ch]
            z_next = auxn_seg[i * per_ch]

            wv = w_seg[:R]
            num_all = gl.add(gl.add(wv, gl.mul(beta, ident_seg)), gamma)
            den_all = gl.add(gl.add(wv, gl.mul(beta, sig_seg)), gamma)
            num_prods = _chunk_prods(num_all)
            den_prods = _chunk_prods(den_all)
            prev = jnp.concatenate([z[None, :], partials[:-1]], axis=0)
            chunk_terms = gl.sub(gl.mul(partials, den_prods),
                                 gl.mul(prev, num_prods))

            l1_term = gl.mul(l1_seg, gl.sub(z, jnp.uint64(1)))[None, :]
            wrap = gl.sub(z_next, partials[-1])[None, :]
            all_terms = jnp.concatenate(
                [gate_terms, l1_term, chunk_terms, wrap], axis=0)

            def horner(carry, t):
                return gl.add(gl.mul(carry, alpha), t), None

            acc, _ = jax.lax.scan(horner, jnp.zeros((m,), jnp.uint64),
                                  all_terms, reverse=True)
            outs.append(gl.mul(acc, zhinv_seg))
        return jnp.stack(outs, axis=0)           # (num_ch, m)

    def _seg_split(arr):
        """(cols, n) -> (n_seg, cols, m)"""
        return jnp.moveaxis(arr.reshape(arr.shape[0], n_seg, m), 1, 0)

    def fn(wire_lde, aux_lde, pi_hash, betas, gammas, alphas, tables):
        aux_next = jnp.roll(aux_lde, -(1 << cfg.rate_bits), axis=1)
        segs = (
            _seg_split(wire_lde),
            _seg_split(aux_lde),
            _seg_split(aux_next),
            _seg_split(tables["sel_lde"]),
            _seg_split(tables["sigma_lde"]),
            _seg_split(tables["const_lde"]),
            _seg_split(tables["ident_n"]),
            tables["zh_inv"].reshape(n_seg, m),
            tables["l1"].reshape(n_seg, m),
            jnp.broadcast_to(pi_hash, (n_seg, 4)),
            jnp.broadcast_to(betas, (n_seg, *betas.shape)),
            jnp.broadcast_to(gammas, (n_seg, *gammas.shape)),
            jnp.broadcast_to(alphas, (n_seg, *alphas.shape)),
        )
        t_seg = jax.lax.map(_segment, segs)      # (n_seg, num_ch, m)
        t_evals = jnp.moveaxis(t_seg, 0, 1).reshape(cfg.num_challenges, n)

        out_cols = []
        for i in range(cfg.num_challenges):
            t_coeffs = gl.mul(ifft(t_evals[i]), tables["unscale"])
            for j in range(1 << cfg.rate_bits):
                out_cols.append(t_coeffs[j * h:(j + 1) * h])
        return fft(jnp.stack(out_cols, axis=0))

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# FRI codeword
# ---------------------------------------------------------------------------

def _make_codeword_fn():
    def fn(all_lde, open_z, open_gz, zeta, gzeta, alpha, tables):
        C, n = all_lde.shape
        pts = tables["pts"]

        def pow_scan(carry, _):
            return ee.mul(carry, alpha), carry

        one = jnp.zeros(2, jnp.uint64).at[0].set(1)
        ac, apows = jax.lax.scan(pow_scan, one, None, length=C)

        def combine(y_vals):
            def body(carry, xs):
                lde_row, a, y = xs
                term = ee.mul_base(jnp.broadcast_to(a, (n, 2)), lde_row)
                term = ee.sub(term, jnp.broadcast_to(ee.mul(a, y), (n, 2)))
                return ee.add(carry, term), None

            init = jnp.zeros((n, 2), jnp.uint64)
            out, _ = jax.lax.scan(body, init, (all_lde, apows, y_vals))
            return out

        bz = combine(open_z)
        bgz = combine(open_gz)
        x_ext = jnp.stack([pts, jnp.zeros_like(pts)], axis=-1)
        inv_z = _ext_inv_vec(ee.sub(x_ext, jnp.broadcast_to(zeta, (n, 2))))
        inv_gz = _ext_inv_vec(ee.sub(x_ext, jnp.broadcast_to(gzeta, (n, 2))))
        return ee.add(ee.mul(bz, inv_z),
                      ee.mul(jnp.broadcast_to(ac, (n, 2)),
                             ee.mul(bgz, inv_gz)))

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------

def prove(data: CircuitData, pw: PartialWitness, timing=None,
          witness=None) -> Proof:
    """``witness``: optionally a FULLY evaluated target-value vector
    (num_targets+1,) — the staged-witness overlap path
    (verified_pbs_recursive) evaluates it on the CPU backend while the
    previous step's device phases are in flight and hands it in here."""
    from ..utils.timing import TimingTree
    tt = timing if timing is not None else TimingTree("prove")
    cfg = data.config
    h = data.h
    n_lde = h << cfg.rate_bits
    with tt.scope("preprocess"):
        pre = preprocess(data)
    vk = pre["vk"]

    with tt.scope("witness"):
        if witness is not None:
            w = jnp.asarray(witness)
        else:
            wfn = data.witness_fn_pre if pw.sponges_precomputed \
                else data.witness_fn
            w = wfn(jnp.asarray(pw.initial_vector(data)))
        trace = w[jnp.asarray(data.wire_index)]          # (h, W)
        pis = np.asarray(w[jnp.asarray(data.pi_targets)]) \
            if len(data.pi_targets) else np.zeros(0, np.uint64)
        pi_hash = np.asarray(HP.hash_no_pad_jit(jnp.asarray(pis))) \
            if pis.size else np.zeros(4, np.uint64)

    # NOTE on attribution: device dispatch is async — each phase's
    # compute lands at its cap fetch (np.asarray = sync), so the
    # challenger observes live INSIDE the scopes or the time would show
    # up in no phase at all.
    with tt.scope("wires commit"):
        wires_cols = jnp.transpose(trace)                # (W, h)
        wire_coeffs = ifft(wires_cols)
        wire_lde = coset_lde(wire_coeffs, cfg.rate_bits)
        wires_tree = _column_tree(wire_lde, cfg.cap_height)
        ch = Challenger()
        ch.observe(vk.circuit_digest)
        ch.observe(pi_hash)
        ch.observe_cap(np.asarray(wires_tree.cap))
    betas = ch.sample_array(cfg.num_challenges)
    gammas = ch.sample_array(cfg.num_challenges)

    with tt.scope("permutation argument"):
        aux_cols = pre["perm_fn"](trace[:, :cfg.num_routed_wires],
                                  jnp.asarray(betas), jnp.asarray(gammas),
                                  pre["tables"])
        aux_coeffs = ifft(aux_cols)
        aux_lde = coset_lde(aux_coeffs, cfg.rate_bits)
        aux_tree = _column_tree(aux_lde, cfg.cap_height)
        ch.observe_cap(np.asarray(aux_tree.cap))
    alphas = ch.sample_array(cfg.num_challenges)

    with tt.scope("quotient"):
        quotient_cols = pre["quotient_fn"](
            wire_lde, aux_lde, jnp.asarray(pi_hash),
            jnp.asarray(betas), jnp.asarray(gammas), jnp.asarray(alphas),
            pre["tables"])
        quot_coeffs = ifft(quotient_cols)
        quot_lde = coset_lde(quot_coeffs, cfg.rate_bits)
        quot_tree = _column_tree(quot_lde, cfg.cap_height)
        ch.observe_cap(np.asarray(quot_tree.cap))

    zeta = jnp.asarray(ch.sample_ext())
    g_h = jnp.asarray(np.array(
        [gl.primitive_root_of_unity(h), 0], dtype=np.uint64))
    gzeta = ee.mul(zeta, g_h)

    with tt.scope("openings"):
        all_coeffs = jnp.concatenate(
            [pre["coeffs"], wire_coeffs, aux_coeffs, quot_coeffs], axis=0)
        open_z = np.asarray(eval_poly_ext_jit(all_coeffs, zeta))
        open_gz = np.asarray(eval_poly_ext_jit(all_coeffs, gzeta))
    ch.observe(open_z.ravel())
    ch.observe(open_gz.ravel())

    n_pre = pre["coeffs"].shape[0]
    n_wires = wire_coeffs.shape[0]
    n_aux = aux_coeffs.shape[0]
    bounds = np.cumsum([0, n_pre, n_wires, n_aux, quot_coeffs.shape[0]])
    openings = [OracleOpening(open_z[bounds[i]:bounds[i + 1]],
                              open_gz[bounds[i]:bounds[i + 1]])
                for i in range(4)]

    fri_alpha = jnp.asarray(ch.sample_ext())
    with tt.scope("fri codeword"):
        all_lde = jnp.concatenate([pre["lde"], wire_lde, aux_lde, quot_lde],
                                  axis=0)
        codeword = pre["codeword_fn"](all_lde, jnp.asarray(open_z),
                                      jnp.asarray(open_gz), zeta, gzeta,
                                      fri_alpha, pre["tables"])

    fcfg = fri.FriConfig(rate_bits=cfg.rate_bits,
                         arity_bits=cfg.fri_arity_bits,
                         num_queries=cfg.fri_num_queries,
                         pow_bits=cfg.fri_pow_bits,
                         final_poly_len=cfg.fri_final_poly_len)
    with tt.scope("fri fold+commit"):
        trees, fbetas, sizes, shifts, final_coeffs = fri.commit_phase(
            codeword, COSET_SHIFT, ch, fcfg)
    with tt.scope("fri pow"):
        pow_witness = fri.grind(ch, fcfg.pow_bits)
        assert fri.check_pow(ch, pow_witness, fcfg.pow_bits)
    with tt.scope("fri queries"):
        indices, fri_rounds = fri.query_phase(trees, sizes, ch, fcfg, n_lde)

        main_trees = [pre["tree"], wires_tree, aux_tree, quot_tree]
        hosts = jax.device_get([merkle.open_paths_gather(t, indices)
                                for t in main_trees])
        per_tree = [merkle.open_paths_finish(h, indices) for h in hosts]
        query_openings = []
        for qi in range(len(indices)):
            leaves = [per_tree[t][qi][0] for t in range(4)]
            sibs = [per_tree[t][qi][1] for t in range(4)]
            query_openings.append(QueryOpening(leaves=leaves, siblings=sibs))
    if timing is None:
        tt.done()

    return Proof(
        public_inputs=pis,
        wires_cap=np.asarray(wires_tree.cap),
        aux_cap=np.asarray(aux_tree.cap),
        quotient_cap=np.asarray(quot_tree.cap),
        openings=openings,
        fri_caps=[np.asarray(t.cap) for t in trees],
        fri_final_coeffs=final_coeffs,
        pow_witness=pow_witness,
        query_indices=indices,
        query_openings=query_openings,
        fri_query_rounds=fri_rounds,
    )
