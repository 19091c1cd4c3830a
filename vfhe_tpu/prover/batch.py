"""Batched prover: B independent proofs of ONE circuit in lock-step.

The reference proves one step at a time on CPU threads; the TPU-native
win is amortizing every device phase across independent proof instances
(different ciphertexts' step proofs — SURVEY.md section 7 "batching"):
witness gen, LDE, Merkle levels, permutation, quotient, openings and FRI
folds all run as (B, ...) batched kernels, while the per-instance
Fiat-Shamir transcripts interleave on the host between phases.

``prove_batch(data, [pw])`` is bit-identical to ``prove(data, pw)`` —
same transcript, same proof — so correctness is inherited; tests pin it.
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
from .fft import COSET_SHIFT, coset_lde, eval_poly_ext, fft, ifft
from .prove import (OracleOpening, Proof, QueryOpening, preprocess,
                    _inv_shift_powers)
from ..utils.timing import TimingTree


@dataclass
class BatchedTree:
    """Merkle trees for B instances over identical leaf shapes: every
    level is one (B, L, 4) tensor."""
    leaf_data: jnp.ndarray        # (B, L, W)
    levels: list                  # [(B, L, 4), ..., (B, cap, 4)]
    _caps_host: np.ndarray = None

    @property
    def caps(self) -> np.ndarray:
        # fetched once — every np.asarray of a device array is a full
        # tunnel round-trip (CLAUDE.md pitfall 5), and caps are read
        # per-instance in the transcript and proof-assembly loops
        if self._caps_host is None:
            self._caps_host = np.asarray(self.levels[-1])
        return self._caps_host


@functools.partial(jax.jit, static_argnums=(1,))
def _batched_tree_levels(leaves: jnp.ndarray, cap_height: int):
    levels = [HP.hash_no_pad(leaves)]
    while levels[-1].shape[1] > (1 << cap_height):
        cur = levels[-1]
        levels.append(HP.two_to_one(cur[:, 0::2], cur[:, 1::2]))
    return tuple(levels)


def batched_tree(leaf_data: jnp.ndarray, cap_height: int = 4) -> BatchedTree:
    leaves = jnp.asarray(leaf_data, jnp.uint64)
    n = leaves.shape[1]
    cap_height = min(cap_height, int(np.log2(n)))
    levels = list(_batched_tree_levels(leaves, cap_height))
    return BatchedTree(leaf_data=leaves, levels=levels)


def batched_open_path(tree: BatchedTree, b: int, index: int):
    sibs = []
    idx = index
    for level in tree.levels[:-1]:
        sibs.append(np.asarray(level[b, idx ^ 1]))
        idx >>= 1
    return np.asarray(tree.leaf_data[b, index]), sibs


def batched_open_paths_gather(tree: BatchedTree, b: int, indices) -> list:
    """Stage the device gathers for one instance's path openings; combine
    many instances/trees into ONE jax.device_get (merkle.
    open_paths_finish pairs them back)."""
    idxs = np.asarray(indices, dtype=np.int64)
    fetch = [tree.leaf_data[b][jnp.asarray(idxs)]]
    cur = idxs.copy()
    for level in tree.levels[:-1]:
        fetch.append(level[b][jnp.asarray(cur ^ 1)])
        cur >>= 1
    return fetch


def batched_open_paths_bulk(tree: BatchedTree, b: int, indices):
    """Bulk path opening: one device->host transfer."""
    host = jax.device_get(batched_open_paths_gather(tree, b, indices))
    return merkle.open_paths_finish(host, indices)


@jax.jit
def _gather_paths_all(leaf_data, levels, idxs):
    """ALL instances' path openings for one batched tree in ONE device
    dispatch: (B, L, W) leaves + [(B, Lk, 4), ...] sibling levels
    (cap excluded) + (B, Q) per-instance indices -> [rows (B, Q, W),
    sib_0 (B, Q, 4), ...]. The per-(instance, tree, level) indexing the
    prover used before cost ~700 tiny dispatches per batch — 5.6 s of
    a 9.3 s batch, pure tunnel latency (round-4 profile)."""
    def one(ld, lv, ix):
        out = [ld[ix]]
        cur = ix
        for level in lv:
            out.append(level[cur ^ 1])
            cur = cur >> 1
        return out
    return jax.vmap(one)(leaf_data, levels, idxs)


@jax.jit
def _gather_paths_shared(leaf_data, levels, idxs):
    """Same, for a tree SHARED by all instances (the preprocessed
    oracle): (L, W) leaves + [(Lk, 4)] levels + (B, Q) indices."""
    out = [leaf_data[idxs]]
    cur = idxs
    for level in levels:
        out.append(level[cur ^ 1])
        cur = cur >> 1
    return out


# sharding-discipline hooks: with CHECK_SHARDING on, every pinned stage
# of a mesh-run prove_batch asserts its dp placement and records itself
# in PINNED_STAGES (tests assert the full stage list — a regression that
# silently re-gathers the batch to one device fails loudly)
CHECK_SHARDING = False
PINNED_STAGES: list = []


@functools.lru_cache(maxsize=None)
def _batched_fns(data_id: int):
    """Per-circuit batched jit kernels (keyed by id(data))."""
    return {}


def prove_batch(data: CircuitData, pws: list, timing=None,
                mesh=None, witness=None) -> list:
    """``mesh``: optional jax.sharding.Mesh — the batch axis is placed on
    the mesh's ``dp`` axis and every device stage (witness gen through
    FRI folds and query-opening gathers) runs SPMD over it; transcripts
    stay on the host per instance, as always.

    ``witness``: optional precomputed (B, num_targets+1) full witness
    array — skips witness evaluation entirely (the staged-witness
    overlap path of ``verified_pbs_recursive_batch``, where stage 1 runs
    ahead of the previous step's device phases)."""
    tt = timing if timing is not None else TimingTree("prove_batch")
    cfg = data.config
    h = data.h
    n_lde = h << cfg.rate_bits
    B = len(pws)
    pre = preprocess(data)
    vk = pre["vk"]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        col_n = mesh.shape.get("col", 1)

        def pin(x, stage: str, col_axis=None):
            # ENFORCE (not hope for) batch-over-dp at every device
            # stage; ``col_axis`` (an axis or a preference-ordered
            # tuple of axes) additionally shards the stage's LONG axis
            # — wire columns when they divide (zero-comm per-column
            # FFTs), else the LDE-domain axis, which is always a power
            # of two — over the col mesh axis, so one large proof
            # spans devices; XLA inserts the transpose/fold
            # collectives (the all-to-alls) on its own
            spec = [None] * x.ndim
            spec[0] = "dp"
            use_col = None
            if col_axis is not None and col_n > 1:
                axes = (col_axis,) if isinstance(col_axis, int) \
                    else col_axis
                use_col = next((a for a in axes
                                if x.shape[a] % col_n == 0), None)
            if use_col is not None:
                spec[use_col] = "col"
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*spec)))
            if CHECK_SHARDING:
                assert x.sharding.spec[:1] == ("dp",), (stage, x.sharding)
                if use_col is not None:
                    assert x.sharding.spec[use_col] == "col", \
                        (stage, x.sharding)
                    PINNED_STAGES.append(stage + "+col")
                PINNED_STAGES.append(stage)
            return x
    else:
        def pin(x, stage: str, col_axis=None):
            return x
    cache = _batched_fns(id(data))
    if "witness" not in cache:
        def batched_witness(fn):
            if hasattr(fn, "inner"):
                # host-mode witness (witness_host=True circuits, e.g. the
                # recursive step circuit whose ~750k-target graph the
                # remote TPU compile service rejects): vmap the raw fn
                # on the in-process CPU backend, ship the result back
                vb = jax.jit(jax.vmap(fn.inner))

                def run(w0):
                    cpu = jax.devices("cpu")[0]
                    out = vb(jax.device_put(np.asarray(w0), cpu))
                    return jnp.asarray(np.asarray(out))
                return run
            # .raw = the traceable jit inside the export-cache wrapper
            return jax.jit(jax.vmap(getattr(fn, "raw", fn)))

        cache["witness"] = batched_witness(data.witness_fn)
        cache["witness_pre"] = batched_witness(data.witness_fn_pre)
        cache["perm"] = jax.jit(jax.vmap(
            pre["perm_fn"], in_axes=(0, 0, 0, None)))
        cache["quotient"] = jax.jit(jax.vmap(
            pre["quotient_fn"], in_axes=(0, 0, 0, 0, 0, 0, None)))
        cache["codeword"] = jax.jit(jax.vmap(
            pre["codeword_fn"], in_axes=(0, 0, 0, 0, 0, 0, None)))
        cache["openings"] = jax.jit(jax.vmap(eval_poly_ext, in_axes=(0, 0)))

    with tt.scope("witness"):
        if witness is not None:
            # already-on-device witness (chunked device stage-2): use it
            # as-is — np.ascontiguousarray would force a device->host->
            # device round-trip over the tunnel
            w = witness if isinstance(witness, jax.Array) \
                else jnp.asarray(np.ascontiguousarray(witness))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                w = jax.device_put(w, NamedSharding(mesh, P("dp", None)))
        else:
            host_mode = hasattr(data.witness_fn, "inner")
            idx0 = pws[0].assigned_indices()
            same_layout = not host_mode and mesh is None and all(
                np.array_equal(idx0, pw.assigned_indices())
                for pw in pws[1:])
            if same_layout:
                # ship only the assigned values and scatter on device —
                # the full (B, num_targets) initial vector is ~99% zeros
                # and the TPU tunnel pays per byte (CLAUDE.md 'per-step
                # host gap')
                vals = np.stack([np.concatenate([c[1] for c in pw._chunks])
                                 for pw in pws])
                if "w0_scatter" not in cache:
                    T1 = data.num_targets + 1

                    @jax.jit
                    def w0_scatter(vals_d, idx_d):
                        z = jnp.zeros((vals_d.shape[0], T1), jnp.uint64)
                        return z.at[:, idx_d].set(vals_d)
                    cache["w0_scatter"] = w0_scatter
                w0 = cache["w0_scatter"](jnp.asarray(vals),
                                         jnp.asarray(idx0))
            else:
                w0 = jnp.asarray(np.stack([pw.initial_vector(data)
                                           for pw in pws]))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                w0 = jax.device_put(w0, NamedSharding(mesh, P("dp", None)))
            all_pre = all(pw.sponges_precomputed for pw in pws)
            w = cache["witness_pre" if all_pre else "witness"](w0)
        w = pin(w, "witness")
        trace = pin(w[:, jnp.asarray(data.wire_index)], "trace",
                    col_axis=2)                              # (B, h, W)
        pis = np.asarray(w[:, jnp.asarray(data.pi_targets)]) \
            if len(data.pi_targets) else np.zeros((B, 0), np.uint64)
        pi_hash = np.asarray(HP.hash_no_pad_jit(jnp.asarray(pis))) \
            if pis.shape[1] else np.zeros((B, 4), np.uint64)

    with tt.scope("wires commit"):
        wires_cols = jnp.swapaxes(trace, 1, 2)           # (B, W, h)
        wire_coeffs = pin(ifft(wires_cols), "wire_coeffs", col_axis=(1, 2))
        wire_lde = pin(coset_lde(wire_coeffs, cfg.rate_bits), "wire_lde",
                       col_axis=(1, 2))
        wires_tree = batched_tree(pin(jnp.swapaxes(wire_lde, 1, 2),
                                      "wires_leaves", col_axis=1),
                                  cfg.cap_height)

    chs = [Challenger() for _ in range(B)]
    for b in range(B):
        chs[b].observe(vk.circuit_digest)
        chs[b].observe(pi_hash[b])
        chs[b].observe_cap(wires_tree.caps[b])
    betas = np.stack([ch.sample_array(cfg.num_challenges) for ch in chs])
    gammas = np.stack([ch.sample_array(cfg.num_challenges) for ch in chs])

    with tt.scope("permutation argument"):
        aux_cols = cache["perm"](trace[:, :, :cfg.num_routed_wires],
                                 jnp.asarray(betas), jnp.asarray(gammas),
                                 pre["tables"])
        aux_coeffs = pin(ifft(aux_cols), "aux_coeffs", col_axis=(1, 2))
        aux_lde = pin(coset_lde(aux_coeffs, cfg.rate_bits), "aux_lde",
                      col_axis=(1, 2))
        aux_tree = batched_tree(pin(jnp.swapaxes(aux_lde, 1, 2),
                                    "aux_leaves", col_axis=1),
                                cfg.cap_height)
    for b in range(B):
        chs[b].observe_cap(aux_tree.caps[b])
    alphas = np.stack([ch.sample_array(cfg.num_challenges) for ch in chs])

    with tt.scope("quotient"):
        quotient_cols = cache["quotient"](
            wire_lde, aux_lde, jnp.asarray(pi_hash), jnp.asarray(betas),
            jnp.asarray(gammas), jnp.asarray(alphas), pre["tables"])
        quot_coeffs = pin(ifft(quotient_cols), "quot_coeffs", col_axis=(1, 2))
        quot_lde = pin(coset_lde(quot_coeffs, cfg.rate_bits), "quot_lde",
                       col_axis=(1, 2))
        quot_tree = batched_tree(pin(jnp.swapaxes(quot_lde, 1, 2),
                                     "quot_leaves", col_axis=1),
                                 cfg.cap_height)
    for b in range(B):
        chs[b].observe_cap(quot_tree.caps[b])

    zetas = np.stack([ch.sample_ext() for ch in chs])          # (B, 2)
    g_h = gl.primitive_root_of_unity(h)
    gzetas = np.asarray(ee.mul_base(jnp.asarray(zetas), jnp.uint64(g_h)))

    with tt.scope("openings"):
        all_coeffs = pin(jnp.concatenate(
            [jnp.broadcast_to(pre["coeffs"], (B, *pre["coeffs"].shape)),
             wire_coeffs, aux_coeffs, quot_coeffs], axis=1),
            "openings", col_axis=(1, 2))
        open_z = np.asarray(cache["openings"](all_coeffs,
                                              jnp.asarray(zetas)))
        open_gz = np.asarray(cache["openings"](all_coeffs,
                                               jnp.asarray(gzetas)))
    for b in range(B):
        chs[b].observe(open_z[b].ravel())
        chs[b].observe(open_gz[b].ravel())

    n_pre = pre["coeffs"].shape[0]
    n_wires = wire_coeffs.shape[1]
    n_aux = aux_coeffs.shape[1]
    bounds = np.cumsum([0, n_pre, n_wires, n_aux, quot_coeffs.shape[1]])

    fri_alphas = np.stack([ch.sample_ext() for ch in chs])
    with tt.scope("fri codeword"):
        all_lde = jnp.concatenate(
            [jnp.broadcast_to(pre["lde"], (B, *pre["lde"].shape)),
             wire_lde, aux_lde, quot_lde], axis=1)
        codeword = pin(cache["codeword"](
            all_lde, jnp.asarray(open_z), jnp.asarray(open_gz),
            jnp.asarray(zetas), jnp.asarray(gzetas),
            jnp.asarray(fri_alphas), pre["tables"]), "fri_codeword",
            col_axis=1)

    fcfg = fri.FriConfig(rate_bits=cfg.rate_bits,
                         arity_bits=cfg.fri_arity_bits,
                         num_queries=cfg.fri_num_queries,
                         pow_bits=cfg.fri_pow_bits,
                         final_poly_len=cfg.fri_final_poly_len)

    with tt.scope("fri fold+commit"):
        v = codeword
        n = v.shape[1]
        shift = COSET_SHIFT
        fri_trees, sizes, shifts = [], [], []
        fold_v = cache.setdefault(
            "fold", jax.vmap(fri.fold_layer, in_axes=(0, 0, None, None)))
        leaves_v = jax.vmap(fri._layer_leaves)
        while n > (fcfg.final_poly_len << fcfg.rate_bits):
            tree = batched_tree(pin(leaves_v(v), "fri_leaves",
                                    col_axis=1))
            fri_trees.append(tree)
            fbeta = []
            for b in range(B):
                chs[b].observe_cap(tree.caps[b])
                fbeta.append(chs[b].sample_ext())
            fbeta = np.stack(fbeta)
            sizes.append(n)
            shifts.append(shift)
            v = pin(fold_v(v, jnp.asarray(fbeta), n, shift), "fri_fold",
                    col_axis=1)
            shift = gl.h_pow(shift, 4)
            n = v.shape[1]

        # final polynomial per instance
        vals = jnp.moveaxis(v, -1, 1)            # (B, 2, n)
        coeffs = ifft(vals)
        unscale = jnp.asarray(_final_unscale(n, shift))
        coeffs = gl.mul(coeffs, unscale)
        coeffs = jnp.moveaxis(coeffs, 1, -1)     # (B, n, 2)
        final_len = n >> fcfg.rate_bits
        final_coeffs = np.asarray(coeffs[:, :final_len])
        assert (np.asarray(coeffs[:, final_len:]) == 0).all()
        for b in range(B):
            chs[b].observe(final_coeffs[b].ravel())

    with tt.scope("fri pow + queries"):
        proofs = []
        main_trees = [None, wires_tree, aux_tree, quot_tree]
        with tt.scope("pow grind"):
            # batched across instances: async-pipelined dispatches,
            # bit-identical witnesses (same per-instance scan order)
            pow_witnesses = fri.grind_batch(chs, fcfg.pow_bits)
            for b in range(B):
                assert fri.check_pow(chs[b], pow_witnesses[b],
                                     fcfg.pow_bits)
        # ONE gather dispatch per TREE (not per instance x tree x
        # level), then ONE device->host transfer
        with tt.scope("query gathers + fetch"):
            all_indices, all_reduced = [], []
            for b in range(B):
                indices = chs[b].sample_indices(int(np.log2(n_lde)),
                                                fcfg.num_queries)
                reduced = [np.asarray(indices)]
                for nn in sizes:
                    reduced.append(reduced[-1] % (nn // 4))
                all_indices.append(np.asarray(indices, dtype=np.int64))
                all_reduced.append(reduced)
            idxs_main = jnp.asarray(np.stack(all_indices))
            fetches = []
            for li, tree in enumerate(fri_trees):
                ix = jnp.asarray(np.stack(
                    [all_reduced[b][li + 1] for b in range(B)]
                ).astype(np.int64))
                fetches.append(_gather_paths_all(
                    tree.leaf_data, list(tree.levels[:-1]), ix))
            fetches.append(_gather_paths_shared(
                pre["tree"].leaf_data, list(pre["tree"].levels[:-1]),
                idxs_main))
            for tree in main_trees[1:]:
                fetches.append(_gather_paths_all(
                    tree.leaf_data, list(tree.levels[:-1]), idxs_main))
            tree_hosts = jax.device_get(fetches)
        with tt.scope("proof assembly"):
            for b in range(B):
                pow_witness = pow_witnesses[b]
                indices, reduced = all_indices[b], all_reduced[b]
                hosts = [[arr[b] for arr in t] for t in tree_hosts]
                nf = len(fri_trees)
                per_layer = [merkle.open_paths_finish(hosts[li],
                                                      reduced[li + 1])
                             for li in range(nf)]
                fri_rounds = []
                for qi in range(len(indices)):
                    layers = [fri.FriLayerOpening(
                        leaf=per_layer[li][qi][0].reshape(4, 2),
                        siblings=per_layer[li][qi][1])
                        for li in range(nf)]
                    fri_rounds.append(fri.FriQueryRound(layers=layers))

                # oracle 0 (preprocessed) is shared across instances
                pre_paths = merkle.open_paths_finish(hosts[nf], indices)
                inst_paths = [merkle.open_paths_finish(hosts[nf + 1 + t],
                                                       indices)
                              for t in range(3)]
                query_openings = []
                for qi in range(len(indices)):
                    leaves = [pre_paths[qi][0]] + \
                        [ip[qi][0] for ip in inst_paths]
                    sibs = [pre_paths[qi][1]] + [ip[qi][1] for ip in inst_paths]
                    query_openings.append(QueryOpening(leaves=leaves,
                                                       siblings=sibs))

                openings = [OracleOpening(open_z[b, bounds[i]:bounds[i + 1]],
                                          open_gz[b, bounds[i]:bounds[i + 1]])
                            for i in range(4)]
                proofs.append(Proof(
                    public_inputs=pis[b],
                    wires_cap=wires_tree.caps[b],
                    aux_cap=aux_tree.caps[b],
                    quotient_cap=quot_tree.caps[b],
                    openings=openings,
                    fri_caps=[t.caps[b] for t in fri_trees],
                    fri_final_coeffs=final_coeffs[b],
                    pow_witness=pow_witness,
                    query_indices=indices,
                    query_openings=query_openings,
                    fri_query_rounds=fri_rounds,
                ))
    if timing is None:
        tt.done()
    return proofs


@functools.lru_cache(maxsize=None)
def _final_unscale(n: int, shift: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    s_inv = gl.h_inv(shift % gl.P)
    for i in range(n):
        out[i] = acc
        acc = gl.h_mul(acc, s_inv)
    return out
