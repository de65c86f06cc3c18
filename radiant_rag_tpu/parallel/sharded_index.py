"""Corpus-sharded retrieval: shard_map scan + collective top-k merge.

The multi-chip analog of DeviceVectorIndex: corpus rows are sharded over the
mesh 'data' axis (each chip holds N/n_shards rows of vectors + packed binary
codes in its HBM); a query batch is replicated; each shard scans locally and
the per-shard top-k (score, global_row) pairs are merged with an
`all_gather` over ICI followed by a final top-k — no host round-trips
(SURVEY.md §5.8, §7.4.2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiant_rag_tpu.ops import quantize as qz
from radiant_rag_tpu.ops import similarity as sim


def _shard_search_body(
    vecs: jax.Array,  # (rows/shard, D) local block
    codes: jax.Array,  # (rows/shard, W) local block
    valid: jax.Array,  # (rows/shard,) local block
    level: jax.Array,  # (rows/shard,) int8 local block
    lang: jax.Array,  # (rows/shard,) int32 local block
    queries: jax.Array,  # (B, D) replicated
    qcodes: jax.Array,  # (B, W) replicated
    level_code: jax.Array,  # () int32, -1 = no filter (replicated)
    lang_code: jax.Array,  # () int32
    k: int,
    kc: int,
    mode: str,
    rows_per_shard: int,
) -> Tuple[jax.Array, jax.Array]:
    """Runs on each shard inside shard_map; returns globally-merged top-k."""
    # Rows are sharded over the flattened ('data','model') product axis.
    shard = jax.lax.axis_index(("data", "model"))
    mask = valid
    mask = mask & jnp.where(level_code < 0, True, level.astype(jnp.int32) == level_code)
    mask = mask & jnp.where(lang_code < 0, True, lang == lang_code)
    if mode == "exact":
        s, i = sim.exact_topk(vecs, queries, mask, k)
    else:
        s, i = sim.two_stage_topk(
            vecs, queries, mask, k, kc, "hamming",
            binary_codes=codes, qbinary=qcodes,
        )
    gi = i + shard * rows_per_shard  # local -> global rows
    gi = jnp.where(s > sim.NEG_INF / 2, gi, -1)
    # Merge across shards over ICI: gather (B, n*k) then final top-k.
    all_s = jax.lax.all_gather(s, ("data", "model"), axis=1, tiled=True)  # (B, n*k)
    all_i = jax.lax.all_gather(gi, ("data", "model"), axis=1, tiled=True)
    top_s, sel = jax.lax.top_k(all_s, k)
    top_i = jnp.take_along_axis(all_i, sel, axis=1)
    return top_s, top_i


class ShardedFlatIndex:
    """Static sharded dense index built from host arrays (bulk/load path).

    Mutation model: built from a host snapshot (or merged from a
    DeviceVectorIndex); incremental updates go to the single-chip engine and
    periodic rebuilds refresh the sharded copy — the segment/compaction story
    for immutable device arrays (SURVEY.md §7.4.3).
    """

    def __init__(self, mesh: Mesh, vecs: np.ndarray, valid: Optional[np.ndarray] = None,
                 level: Optional[np.ndarray] = None, lang: Optional[np.ndarray] = None):
        self.mesh = mesh
        n_shards = mesh.devices.shape[0] * (mesh.devices.shape[1] if len(mesh.devices.shape) > 1 else 1)
        # rows padded to a multiple of shard count (and lane alignment)
        n, d = vecs.shape
        self.dim = d
        self.n_docs = n
        per = -(-n // n_shards)
        per = ((per + 127) // 128) * 128  # lane-align each shard block
        total = per * n_shards
        self.rows_per_shard = per
        vp = np.zeros((total, d), np.float32)
        vp[:n] = vecs
        vmask = np.zeros((total,), bool)
        vmask[:n] = True if valid is None else valid
        lvl = np.zeros((total,), np.int8)
        if level is not None:
            lvl[:n] = level
        lng = np.zeros((total,), np.int32)
        if lang is not None:
            lng[:n] = lang
        codes = np.asarray(qz.pack_binary(jnp.asarray(vp)))

        row_sharding = NamedSharding(mesh, P(("data", "model"),))
        mat_sharding = NamedSharding(mesh, P(("data", "model"), None))
        self.vecs = jax.device_put(vp, mat_sharding)
        self.codes = jax.device_put(codes, mat_sharding)
        self.valid = jax.device_put(vmask, row_sharding)
        self.level = jax.device_put(lvl, row_sharding)
        self.lang = jax.device_put(lng, row_sharding)
        self._n_shards = n_shards
        self._search_cache = {}

    def _get_program(self, k: int, kc: int, mode: str):
        key = (k, kc, mode)
        if key not in self._search_cache:
            body = partial(
                _shard_search_body,
                k=k, kc=kc, mode=mode, rows_per_shard=self.rows_per_shard,
            )
            mapped = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    P(("data", "model"), None),  # vecs
                    P(("data", "model"), None),  # codes
                    P(("data", "model"),),  # valid
                    P(("data", "model"),),  # level
                    P(("data", "model"),),  # lang
                    P(),  # queries replicated
                    P(),  # qcodes replicated
                    P(),  # level_code
                    P(),  # lang_code
                ),
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._search_cache[key] = jax.jit(mapped)
        return self._search_cache[key]

    def search(
        self,
        queries: np.ndarray,  # (B, D)
        k: int,
        mode: str = "binary",
        rescore_multiplier: float = 4.0,
        level_code: int = -1,
        lang_code: int = -1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, np.float32)
        queries = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        k_eff = min(k, self.rows_per_shard)
        kc = min(max(k_eff, int(round(k_eff * rescore_multiplier))), self.rows_per_shard)
        qdev = jnp.asarray(queries)
        qcodes = qz.pack_binary(qdev)
        prog = self._get_program(k_eff, kc, mode)
        s, i = prog(self.vecs, self.codes, self.valid, self.level, self.lang,
                    qdev, qcodes, jnp.asarray(level_code, jnp.int32),
                    jnp.asarray(lang_code, jnp.int32))
        return np.asarray(s), np.asarray(i).astype(np.int64)


def _shard_hybrid_body(
    vecs: jax.Array,  # (rows/shard, D)
    codes: jax.Array,  # (rows/shard, W)
    sketch: jax.Array,  # (rows/shard, S) int8 BM25 impact sketch
    dm_tids: jax.Array,  # (rows/shard, L) doc-major term ids (exact rescore)
    dm_tfs: jax.Array,  # (rows/shard, L)
    doc_lens: jax.Array,  # (rows/shard,)
    valid: jax.Array,  # (rows/shard,)
    queries: jax.Array,  # (B, D) replicated
    qcodes: jax.Array,  # (B, W) replicated
    qind: jax.Array,  # (B, S) int8 replicated
    q_tids: jax.Array,  # (B, T) replicated
    q_idfs: jax.Array,  # (B, T) replicated
    sketch_scale: jax.Array,  # () f32
    avgdl: jax.Array,  # () f32
    leg_w: jax.Array,  # (2,) f32 replicated — calibrated (dense, bm25) weights
    dense_k: int,
    bm25_k: int,
    fused_k: int,
    rrf_k: int,
    kc: int,
    mode: str,
    rows_per_shard: int,
    fusion: str = "equal",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full hybrid on each shard; global merge + fusion over ICI.

    Dense and sparse runs are merged ACROSS shards first (all_gather of
    per-shard top-k), so RRF sees globally-correct ranks; fusion itself is
    then computed redundantly on every device (k is tiny) — no extra
    communication round. `fusion` carries the single-chip calibration
    semantics (`index/hybrid._fuse_stage`) to the pod: equal RRF (reference
    parity), calibration-weighted RRF, or z-score interpolation."""
    from radiant_rag_tpu.index.hybrid import _fuse_stage
    from radiant_rag_tpu.ops.bm25 import bm25_candidate_rescore, bm25_sketch_scores

    shard = jax.lax.axis_index(("data", "model"))

    if mode == "exact":
        ds, di = sim.exact_topk(vecs, queries, valid, dense_k)
    else:
        ds, di = sim.two_stage_topk(
            vecs, queries, valid, dense_k, kc, "hamming",
            binary_codes=codes, qbinary=qcodes)
    gdi = jnp.where(ds > sim.NEG_INF / 2, di + shard * rows_per_shard, -1)

    # sparse: local sketch scan -> exact BM25 rescore of local candidates;
    # exact scores merge correctly across shards by value
    bm_scores = bm25_sketch_scores(sketch, sketch_scale, qind, valid)
    bm_kc = min(max(bm25_k * 4, bm25_k), rows_per_shard)
    s1, cand = sim.full_topk(bm_scores, bm_kc)
    cand = jnp.where(s1 > 0.0, cand, -1).astype(jnp.int32)
    exact = bm25_candidate_rescore(dm_tids, dm_tfs, doc_lens, avgdl,
                                   cand, q_tids, q_idfs)
    bs, sel = jax.lax.top_k(exact, bm25_k)
    bi = jnp.take_along_axis(cand, sel, axis=1)
    gbi = jnp.where(bs > 0.0, bi + shard * rows_per_shard, -1)

    # global merge of each run over ICI
    all_ds = jax.lax.all_gather(ds, ("data", "model"), axis=1, tiled=True)
    all_di = jax.lax.all_gather(gdi, ("data", "model"), axis=1, tiled=True)
    d_s, sel = jax.lax.top_k(all_ds, dense_k)
    d_i = jnp.take_along_axis(all_di, sel, axis=1)

    all_bs = jax.lax.all_gather(bs, ("data", "model"), axis=1, tiled=True)
    all_bi = jax.lax.all_gather(gbi, ("data", "model"), axis=1, tiled=True)
    b_s, sel = jax.lax.top_k(all_bs, bm25_k)
    b_i = jnp.take_along_axis(all_bi, sel, axis=1)

    f_s, f_i = _fuse_stage(d_i, b_i, leg_w, fused_k, rrf_k, fusion, d_s, b_s)
    packed = jnp.concatenate([
        d_s, d_i.astype(jnp.float32), b_s, b_i.astype(jnp.float32),
        f_s, f_i.astype(jnp.float32),
    ], axis=1)
    return packed


class ShardedHybridIndex(ShardedFlatIndex):
    """Corpus-sharded HYBRID retrieval: dense + BM25 sketch + RRF, one
    shard_map program, collectives over ICI (the multi-chip form of
    `index/hybrid.py`)."""

    def __init__(self, mesh: Mesh, vecs: np.ndarray, bm25,
                 valid: Optional[np.ndarray] = None) -> None:
        """bm25: a finalized BM25Index whose rows align with `vecs` rows."""
        super().__init__(mesh, vecs, valid)
        n = vecs.shape[0]
        total = self.rows_per_shard * self._n_shards
        bm25.ensure_sketch(n)
        bm25.ensure_doc_major(n)
        bm25._device_doc_lens(n)
        self.bm25 = bm25
        mat_sharding = NamedSharding(mesh, P(("data", "model"), None))
        row_sharding = NamedSharding(mesh, P(("data", "model"),))

        def pad_rows(arr, dtype):
            a = np.asarray(arr)
            out = np.zeros((total,) + a.shape[1:], dtype)
            out[: a.shape[0]] = a[:min(a.shape[0], total)]
            return out

        self.sketch = jax.device_put(pad_rows(bm25._sketch, np.int8), mat_sharding)
        self.dm_tids = jax.device_put(pad_rows(bm25._dm_tids, np.int32), mat_sharding)
        self.dm_tfs = jax.device_put(pad_rows(bm25._dm_tfs, np.int32), mat_sharding)
        self.doc_lens = jax.device_put(
            pad_rows(np.asarray(bm25._dl_dev)[:n], np.float32), row_sharding)
        self.sketch_scale = jnp.asarray(np.asarray(bm25._sketch_scale), jnp.float32)
        self.avgdl = jnp.asarray(bm25.avgdl, jnp.float32)
        # calibration carried from the single-chip HybridSearcher via
        # set_fusion() (ShardedVectorStore re-installs it on refresh)
        self.fusion_mode = "equal"
        self.leg_weights = np.asarray([0.5, 0.5], np.float32)
        self._hybrid_cache = {}

    def set_fusion(self, mode: str, weights) -> None:
        """Install the calibrated fusion config (mode + per-leg weights) for
        subsequent hybrid_search calls. Weights are a dynamic program input,
        so changing them never recompiles; a mode change compiles once."""
        self.fusion_mode = mode
        self.leg_weights = np.asarray(weights, np.float32)

    def _get_hybrid_program(self, dense_k, bm25_k, fused_k, rrf_k, kc, mode,
                            fusion):
        key = (dense_k, bm25_k, fused_k, rrf_k, kc, mode, fusion)
        if key not in self._hybrid_cache:
            body = partial(_shard_hybrid_body, dense_k=dense_k, bm25_k=bm25_k,
                           fused_k=fused_k, rrf_k=rrf_k, kc=kc, mode=mode,
                           rows_per_shard=self.rows_per_shard, fusion=fusion)
            mapped = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(("data", "model"), None),  # vecs
                          P(("data", "model"), None),  # codes
                          P(("data", "model"), None),  # sketch
                          P(("data", "model"), None),  # dm_tids
                          P(("data", "model"), None),  # dm_tfs
                          P(("data", "model"),),  # doc_lens
                          P(("data", "model"),),  # valid
                          P(), P(), P(), P(), P(),  # queries, qcodes, qind, q_tids, q_idfs
                          P(), P(), P()),  # sketch_scale, avgdl, leg_w
                out_specs=P(),
                check_vma=False,
            )
            self._hybrid_cache[key] = jax.jit(mapped)
        return self._hybrid_cache[key]

    def hybrid_search(
        self,
        queries_dense: np.ndarray,  # (B, D)
        queries_text,  # list[str] — tokenized against the bm25 vocab
        dense_k: int = 10,
        bm25_k: int = 10,
        fused_k: int = 15,
        rrf_k: int = 60,
        mode: str = "binary",
        rescore_multiplier: float = 4.0,
        fusion: str = "",  # "" = the set_fusion()-installed config
    ):
        q = np.asarray(queries_dense, np.float32)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        fusion = fusion or self.fusion_mode
        dk = min(dense_k, self.rows_per_shard)
        bk = min(bm25_k, self.rows_per_shard)
        fk = min(fused_k, dk + bk)
        kc = min(max(dk, int(round(dk * rescore_multiplier))), self.rows_per_shard)
        qdev = jnp.asarray(q)
        qcodes = qz.pack_binary(qdev)
        qind = self.bm25.make_query_indicator(queries_text)
        q_tids, q_idfs = self.bm25.make_query_terms(queries_text)
        prog = self._get_hybrid_program(dk, bk, fk, rrf_k, kc, mode, fusion)
        packed = np.asarray(prog(
            self.vecs, self.codes, self.sketch, self.dm_tids, self.dm_tfs,
            self.doc_lens, self.valid,
            qdev, qcodes, jnp.asarray(qind), jnp.asarray(q_tids),
            jnp.asarray(q_idfs), self.sketch_scale, self.avgdl,
            jnp.asarray(self.leg_weights, jnp.float32)))
        out = {}
        off = 0
        for name, k in (("dense", dk), ("bm25", bk), ("fused", fk)):
            out[name] = (packed[:, off: off + k].copy(),
                         packed[:, off + k: off + 2 * k].astype(np.int64))
            off += 2 * k
        return out
