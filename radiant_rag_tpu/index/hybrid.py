"""Fused hybrid retrieval: dense scan + BM25 + RRF in ONE device program.

The reference runs dense and BM25 retrieval in two host threads
(ThreadPoolExecutor(2), `orchestrator.py:994-1028`) against external services,
then fuses in python (`agents/fusion.py`). Here the whole hybrid query — the
quantized dense scan with fp32 rescore, the CSR BM25 page scoring, RRF fusion
and all three top-ks — is a single jit program: one host->device transfer
(queries + BM25 page table, KBs) and one device->host fetch (packed results).
"Parallel retrieval" is free: XLA schedules both scans in one program.

Result packing: all six result blocks (dense/bm25/fused scores+rows) return
as one f32 array; row indices are exact in f32 up to 2^24 rows/chip (16.7M —
above that, split the fetch or shard the corpus; the sharded path in
parallel/sharded_index.py is the intended regime long before then).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radiant_rag_tpu.index.bm25 import BM25Index
from radiant_rag_tpu.index.engine import DeviceVectorIndex
from radiant_rag_tpu.ops import quantize as qz
from radiant_rag_tpu.ops import similarity as sim
from radiant_rag_tpu.ops.bm25 import (
    bm25_candidate_rescore, bm25_pages_scores, bm25_sketch_select,
)
from radiant_rag_tpu.ops.fusion import rrf_fuse, score_fuse, weighted_rrf_fuse


def resolve_fused_depth(retrieval_cfg) -> int:
    """Resolve retrieval.fused_depth: -1 (auto) = 4 x fused_top_k — the
    reference's rerank candidate ratio (`agents/rerank.py:85-117`), measured
    here to carry the quality gain on its own (BENCH_NOTES round 4:
    fuse@32 -> top-10 = +0.047 MRR over fuse@10 at 100k real-text docs).
    0 disables deepening; > 0 is the explicit pool depth."""
    fd = getattr(retrieval_cfg, "fused_depth", -1)
    if fd is None or int(fd) < 0:
        return 4 * int(getattr(retrieval_cfg, "fused_top_k", 15))
    return int(fd)


def _fuse_stage(dense_i, bm_i, leg_w, fused_k, rrf_k, fusion,
                dense_s=None, bm_s=None):
    """Equal-weight RRF (reference parity), calibration-weighted RRF (the
    quality-aware default: a leg measured to be unreliable — e.g. an
    untrained dense encoder — is down-weighted to a tiebreaker instead of
    dragging fused MRR below the better single leg), or z-normalized score
    interpolation ("score": safe for mid-quality legs — promotes a weak-leg
    candidate only when that leg is confident about it). leg_w: (2,) f32."""
    if fusion == "equal":
        return rrf_fuse((dense_i, bm_i), k=fused_k, rrf_k=rrf_k)
    b = dense_i.shape[0]
    w = jnp.broadcast_to(leg_w[None, :], (b, 2))
    if fusion == "score":
        return score_fuse((dense_i, bm_i), (dense_s, bm_s), w, k=fused_k)
    return weighted_rrf_fuse((dense_i, bm_i), w, k=fused_k, rrf_k=rrf_k)


def _dense_stage(vecs, codes, i8, i8_scale, i8_offset, mask, queries, qvalid,
                 dense_k, kc, mode, select=""):
    if mode == "exact":
        dense_s, dense_i = sim.exact_topk(vecs, queries, mask, dense_k)
    elif mode == "binary":
        qbin = qz.pack_binary(queries)
        dense_s, dense_i = sim.two_stage_topk(
            vecs, queries, mask, dense_k, kc, "hamming", binary_codes=codes,
            qbinary=qbin, int8_codes=i8, int8_scale=i8_scale, int8_offset=i8_offset,
            select=select)
    else:
        dense_s, dense_i = sim.two_stage_topk(
            vecs, queries, mask, dense_k, kc, "int8",
            int8_codes=i8, int8_scale=i8_scale, int8_offset=i8_offset,
            select=select)
    dense_i = jnp.where(dense_s > sim.NEG_INF / 2, dense_i, -1)
    dense_i = jnp.where(qvalid[:, None], dense_i, -1)
    return dense_s, dense_i


def _pack(dense_s, dense_i, bm_s, bm_i, fused_s, fused_i):
    return jnp.concatenate([
        dense_s, dense_i.astype(jnp.float32),
        bm_s, bm_i.astype(jnp.float32),
        fused_s, fused_i.astype(jnp.float32),
    ], axis=1)


def _hybrid_sketch_core(
    vecs, codes, i8, i8_scale, i8_offset, valid, level, lang,
    sketch, sketch_scale, qind,
    dm_tids, dm_tfs, doc_lens, avgdl, q_tids, q_idfs,
    queries, qvalid, level_code, lang_code, leg_w,
    dense_k: int, bm25_k: int, fused_k: int, rrf_k: int, kc: int, bm_kc: int,
    mode: str, k1: float = 1.5, b: float = 0.75, fusion: str = "confidence",
    select: str = "", pool: int = 0,
):
    """Hybrid with impact-sketch BM25 stage-1 (MXU matmul) + EXACT BM25
    candidate rescore — the sparse leg mirrors the dense two-stage design:
    approximate full-corpus scan, exact scoring of the survivors.

    pool > 0 enables candidate-pool deepening: both legs are computed at
    depth `pool`, fusion runs over the deep pools (output still fused_k),
    and the returned legs are sliced back to dense_k/bm25_k. Measured on the
    100k real-text corpus: fusing at pool=32 and truncating to 10 gains
    +0.047 MRR / +0.05 hit@10 over fusing at 10 (BENCH_NOTES round 4) — a
    doc ranked 11-32 by one leg but high by the other can enter the fused
    top-k only if fusion sees it."""
    mask = valid
    mask = mask & jnp.where(level_code < 0, True, level.astype(jnp.int32) == level_code)
    mask = mask & jnp.where(lang_code < 0, True, lang == lang_code)

    dk_eff = max(dense_k, pool) if pool else dense_k
    bk_eff = max(bm25_k, pool) if pool else bm25_k
    dense_s, dense_i = _dense_stage(
        vecs, codes, i8, i8_scale, i8_offset, mask, queries, qvalid, dk_eff, kc,
        mode, select)

    if bm_kc > bk_eff:  # exact rescore of sketch candidates
        _s1, cand = bm25_sketch_select(sketch, sketch_scale, qind, mask, bm_kc, select)
        cand = sim.sort_candidates_by_row(cand)  # exact-path tie-break parity
        exact = bm25_candidate_rescore(dm_tids, dm_tfs, doc_lens, avgdl,
                                       cand, q_tids, q_idfs, k1, b)
        bm_s, sel = jax.lax.top_k(exact, bk_eff)
        bm_i = jnp.take_along_axis(cand, sel, axis=1)
        bm_i = jnp.where(bm_s > 0.0, bm_i, -1)
    else:
        bm_s, bm_i = bm25_sketch_select(sketch, sketch_scale, qind, mask, bk_eff, select)
    bm_i = jnp.where(qvalid[:, None], bm_i, -1)

    fused_s, fused_i = _fuse_stage(dense_i, bm_i, leg_w, fused_k, rrf_k,
                                   fusion, dense_s, bm_s)
    return _pack(dense_s[:, :dense_k], dense_i[:, :dense_k],
                 bm_s[:, :bm25_k], bm_i[:, :bm25_k], fused_s, fused_i)


_hybrid_program_sketch = partial(jax.jit, static_argnames=(
    "dense_k", "bm25_k", "fused_k", "rrf_k", "kc", "bm_kc", "mode", "k1", "b",
    "fusion", "select", "pool"))(_hybrid_sketch_core)


# --------------------------------------------------------------------------
# Packed-upload variant: ONE h2d transfer per batch.
#
# Per-batch host->device traffic through a remote-device tunnel pays both a
# per-transfer latency floor and ~70 MB/s effective bandwidth
# (tools/profile_host_dispatch.py: the f32 queries + dense (B, S) indicator +
# tids/idfs uploads cost more wall time than the device program itself at
# 100k docs). The host packs everything per-batch into one uint8 blob —
# queries as fp16, sketch-bin ids sparse int16 instead of the dense (B, S)
# indicator, header scalars — cutting ~3.6 MB over ~7 transfers to ~0.95 MB
# in ONE; the device program bitcasts slices back out and rebuilds the dense
# indicator with a scatter-add.
# --------------------------------------------------------------------------

_BLOB_HDR = 32  # bytes: i32 n_valid, level_code, lang_code, pad; f32 leg_w[2], avgdl, pad


def _blob_layout(bq: int, d: int, t: int, s: int) -> Dict[str, Tuple[int, int]]:
    """Byte offsets/sizes of each section (all 4-byte aligned). Bin codes
    (±(bin+1), see make_query_bins) are int16 unless the sketch width
    exceeds the int16 encoding range."""
    bw = 2 if s <= (1 << 15) - 2 else 4
    off = _BLOB_HDR
    lay = {}
    lay["q16"] = (off, bq * d * 2); off += bq * d * 2
    lay["tids"] = (off, bq * t * 4); off += bq * t * 4
    lay["idfs"] = (off, bq * t * 4); off += bq * t * 4
    lay["bins"] = (off, bq * t * bw); off += bq * t * bw
    lay["_binw"] = (0, bw)
    lay["_total"] = (0, (off + 3) // 4 * 4)
    return lay


_EMBED_DEVICE_WARNED = False


def embed_queries_device(local_models, engine, texts: Sequence[str]):
    """Device-resident query embeddings for search_rows(_qdev=...), or None.

    Shared acquisition logic for the serving (`app._dispatch_fused`) and
    pipeline (`orchestrator._run_hybrid_fused`) call sites: the JAX embedder
    pads to the engine's query bucket and the embeddings never visit the
    host. Returns None (caller falls back to host `embed`) for non-JAX
    embedding backends, dim mismatches, and oversized batches."""
    if (not hasattr(local_models, "embed_device")
            or getattr(local_models, "embedding_dimension", None) != engine.dim
            or len(texts) > engine.max_query_bucket()):
        return None
    try:
        return local_models.embed_device(list(texts),
                                         pad_to=engine._bucket_of(len(texts)))
    except Exception as exc:  # cache-only backends, tokenizer quirks: fall back
        # A persistent failure here silently demotes every serving query to
        # the host embed path (~27 ms/batch on a tunneled chip) — log the
        # first occurrence so a regression in embed_device is visible instead
        # of masquerading as a permanent perf loss.
        global _EMBED_DEVICE_WARNED
        if not _EMBED_DEVICE_WARNED:
            _EMBED_DEVICE_WARNED = True
            logging.getLogger(__name__).warning(
                "embed_device failed (%s: %s); falling back to host embed "
                "path for this and future batches", type(exc).__name__, exc)
        return None


def pack_query_blob(queries: np.ndarray, q_tids: np.ndarray, q_idfs: np.ndarray,
                    q_bins: np.ndarray, n_valid: int, level_code: int,
                    lang_code: int, leg_w: np.ndarray, sketch_dim: int,
                    avgdl: float = 0.0) -> np.ndarray:
    """Assemble the single-upload query blob (host side, ~0.2 ms)."""
    bq, d = queries.shape
    t = q_tids.shape[1]
    lay = _blob_layout(bq, d, t, sketch_dim)
    blob = np.zeros(lay["_total"][1], np.uint8)
    hdr_i = np.asarray([n_valid, level_code, lang_code, 0], np.int32)
    blob[0:16] = hdr_i.view(np.uint8)
    blob[16:28] = np.asarray([leg_w[0], leg_w[1], avgdl], np.float32).view(np.uint8)

    def put(name, arr):
        off, size = lay[name]
        raw = np.ascontiguousarray(arr).view(np.uint8).reshape(-1)
        blob[off : off + size] = raw

    put("q16", queries.astype(np.float16))
    put("tids", q_tids.astype(np.int32))
    put("idfs", q_idfs.astype(np.float32))
    put("bins", q_bins.astype(np.int16 if lay["_binw"][1] == 2 else np.int32))
    return blob


def _unpack_query_blob(blob: jax.Array, bq: int, d: int, t: int, s: int):
    """Device-side inverse of pack_query_blob (inside jit; static sizes)."""
    lay = _blob_layout(bq, d, t, s)

    def cut(name, width, dtype):
        off, size = lay[name]
        return jax.lax.bitcast_convert_type(
            blob[off : off + size].reshape(size // width, width), dtype)

    hdr = jax.lax.bitcast_convert_type(blob[0:16].reshape(4, 4), jnp.int32)
    hdr_f = jax.lax.bitcast_convert_type(blob[16:28].reshape(3, 4), jnp.float32)
    leg_w, avgdl = hdr_f[:2], hdr_f[2]
    n_valid, level_code, lang_code = hdr[0], hdr[1], hdr[2]
    queries = cut("q16", 2, jnp.float16).reshape(bq, d).astype(jnp.float32)
    q_tids = cut("tids", 4, jnp.int32).reshape(bq, t)
    q_idfs = cut("idfs", 4, jnp.float32).reshape(bq, t)
    bw = lay["_binw"][1]
    q_bins = cut("bins", bw, jnp.int16 if bw == 2 else jnp.int32).reshape(bq, t)
    qvalid = jnp.arange(bq) < n_valid
    # dense (bq, S) int8 SIGNED indicator via scatter-add (parity with
    # make_query_indicator): blob bin codes are ±(bin+1), 0 = pad
    # (make_query_bins) — decode sign and index, drop pads
    sign = jnp.where(q_bins > 0, 1, -1).astype(jnp.int8)
    bin_idx = jnp.abs(q_bins.astype(jnp.int32)) - 1
    flat = jnp.where(q_bins != 0,
                     jnp.arange(bq, dtype=jnp.int32)[:, None] * s + bin_idx,
                     bq * s)
    qind = jnp.zeros((bq * s,), jnp.int8).at[flat.reshape(-1)].add(
        sign.reshape(-1), mode="drop").reshape(bq, s)
    return (queries, qvalid, q_tids, q_idfs, qind, level_code, lang_code,
            leg_w, avgdl)


@partial(jax.jit, static_argnames=("bq", "t", "dense_k", "bm25_k", "fused_k",
                                   "rrf_k", "kc", "bm_kc", "mode", "k1", "b",
                                   "fusion", "select", "pool"))
def _hybrid_program_sketch_blob(
    vecs, codes, i8, i8_scale, i8_offset, valid, level, lang,
    sketch, sketch_scale, dm_tids, dm_tfs, doc_lens,
    blob, bq: int, t: int,
    dense_k: int, bm25_k: int, fused_k: int, rrf_k: int, kc: int, bm_kc: int,
    mode: str, k1: float = 1.5, b: float = 0.75, fusion: str = "confidence",
    select: str = "", pool: int = 0,
):
    d = i8.shape[1]
    s = sketch.shape[1]
    (queries, qvalid, q_tids, q_idfs, qind,
     level_code, lang_code, leg_w, avgdl) = _unpack_query_blob(blob, bq, d, t, s)
    return _hybrid_sketch_core(
        vecs, codes, i8, i8_scale, i8_offset, valid, level, lang,
        sketch, sketch_scale, qind,
        dm_tids, dm_tfs, doc_lens, avgdl, q_tids, q_idfs,
        queries, qvalid, level_code, lang_code, leg_w,
        dense_k, bm25_k, fused_k, rrf_k, kc, bm_kc, mode, k1, b, fusion,
        select, pool)


@partial(jax.jit, static_argnames=("bq", "t", "dense_k", "bm25_k", "fused_k",
                                   "rrf_k", "kc", "bm_kc", "mode", "k1", "b",
                                   "fusion", "select", "pool"))
def _hybrid_program_sketch_blob_qdev(
    qdev,  # (bq, D) device-resident L2-normalized queries (rows >= n_valid are zero)
    vecs, codes, i8, i8_scale, i8_offset, valid, level, lang,
    sketch, sketch_scale, dm_tids, dm_tfs, doc_lens,
    blob, bq: int, t: int,
    dense_k: int, bm25_k: int, fused_k: int, rrf_k: int, kc: int, bm_kc: int,
    mode: str, k1: float = 1.5, b: float = 0.75, fusion: str = "confidence",
    select: str = "", pool: int = 0,
):
    """The blob program with DEVICE queries: the blob carries only the BM25
    sections (d=0 layout — no fp16 dense block), so an embed program's output
    feeds retrieval without ever visiting the host."""
    s = sketch.shape[1]
    (_, qvalid, q_tids, q_idfs, qind,
     level_code, lang_code, leg_w, avgdl) = _unpack_query_blob(blob, bq, 0, t, s)
    return _hybrid_sketch_core(
        vecs, codes, i8, i8_scale, i8_offset, valid, level, lang,
        sketch, sketch_scale, qind,
        dm_tids, dm_tfs, doc_lens, avgdl, q_tids, q_idfs,
        qdev.astype(jnp.float32), qvalid, level_code, lang_code, leg_w,
        dense_k, bm25_k, fused_k, rrf_k, kc, bm_kc, mode, k1, b, fusion,
        select, pool)


@partial(jax.jit, static_argnames=("dense_k", "bm25_k", "fused_k", "rrf_k", "kc", "mode", "bq", "num_docs", "k1", "b", "fusion", "select", "pool"))
def _hybrid_program(
    vecs, codes, i8, i8_scale, i8_offset, valid, level, lang,
    post_rows, post_tf, page_start, page_len, page_qidx, page_idf, doc_lens, avgdl,
    queries, qvalid, level_code, lang_code, leg_w,
    dense_k: int, bm25_k: int, fused_k: int, rrf_k: int, kc: int, mode: str,
    bq: int, num_docs: int, k1: float, b: float, fusion: str = "confidence",
    select: str = "", pool: int = 0,
):
    mask = valid
    mask = mask & jnp.where(level_code < 0, True, level.astype(jnp.int32) == level_code)
    mask = mask & jnp.where(lang_code < 0, True, lang == lang_code)

    dk_eff = max(dense_k, pool) if pool else dense_k
    bk_eff = max(bm25_k, pool) if pool else bm25_k
    dense_s, dense_i = _dense_stage(
        vecs, codes, i8, i8_scale, i8_offset, mask, queries, qvalid, dk_eff, kc,
        mode, select)

    # exact sparse stage (shares the same mask/row space)
    bm_scores = bm25_pages_scores(
        post_rows, post_tf, page_start, page_len, page_qidx, page_idf,
        doc_lens, avgdl, mask, bq, num_docs, k1, b)
    bm_s, bm_i = jax.lax.top_k(bm_scores, bk_eff)
    bm_i = jnp.where(bm_s > 0.0, bm_i, -1).astype(jnp.int32)
    bm_i = jnp.where(qvalid[:, None], bm_i, -1)

    fused_s, fused_i = _fuse_stage(dense_i, bm_i, leg_w, fused_k, rrf_k,
                                   fusion, dense_s, bm_s)
    return _pack(dense_s[:, :dense_k], dense_i[:, :dense_k],
                 bm_s[:, :bm25_k], bm_i[:, :bm25_k], fused_s, fused_i)


class HybridSearcher:
    """Batched hybrid retrieval over one store's row space."""

    def __init__(self, engine: DeviceVectorIndex, bm25: BM25Index) -> None:
        self.engine = engine
        self.bm25 = bm25
        # per-leg RRF weights (dense, bm25); set by calibrate_fusion(). The
        # default is equal mass = reference behavior until calibrated.
        self.leg_weights = np.asarray([0.5, 0.5], np.float32)
        # resolved by calibrate_fusion()'s probe-measured config selection;
        # "auto" queries resolve to this ("confidence" until calibrated)
        self.fusion_mode = "confidence"
        # candidate-pool deepening default for search_rows(fused_depth=None):
        # legs are computed and fused at this depth, the fused output is
        # truncated to fused_k on device. 0 = off (legs at their own k's —
        # the pre-round-4 semantics every parity test pins). The product
        # sets this from retrieval.fused_depth (orchestrator/app): measured
        # +0.047 MRR / +0.05 hit@10 at depth 32 vs 10 on 100k real text.
        self.default_fused_depth = 0
        self._calibrated_at = -1  # engine.count when last calibrated
        self.last_calibration = None

    def max_query_bucket(self) -> int:
        """Hybrid-aware bucket gate: the engine gate forced to score mode
        (the BM25 legs materialize a (B, N) transient even under a chunked
        dense select) minus the BM25 device arrays' residency. Serving
        callers size coalescer batches/warmup ladders with THIS, not the
        engine gate — at the pages-only 10M tier the two diverge."""
        eng = self.engine
        self.bm25.plan_hbm(eng.capacity)
        return eng.max_query_bucket(
            extra_resident=self.bm25.device_bytes_projected(eng.capacity),
            score_gated=True)

    def rebind_bm25(self, bm25: BM25Index) -> None:
        """Point at a replacement BM25 index (load/rebuild swaps the object).

        A swap of the SAME corpus's index keeps calibration (leg quality
        unchanged); callers replacing analyzers/content should follow with
        invalidate_calibration()."""
        self.bm25 = bm25

    def calibrate_fusion(self, embed_fn, texts_of_rows, n_probes: int = 128,
                         seed: int = 0, top_k: int = 10,
                         paraphrase_fraction: float = 0.5,
                         seeds: int = 1, max_probes: int = 512) -> np.ndarray:
        """Unsupervised fusion-config selection (no labels needed).

        Samples indexed docs and makes pseudo-query probes — a mix of ICT
        spans and synonym-paraphrase rewrites (`parallel/data.py`), weighted
        by `paraphrase_fraction`, so the probe distribution exercises BOTH
        the lexical regime (BM25's) and the semantic-gap regime (the dense
        leg's) instead of only verbatim spans. Each leg's self-retrieval MRR
        (target = source doc) sets the calibrated RRF weights ~ mrr^2
        (`ops/fusion.calibrated_leg_weights`); a leg that cannot find a doc
        from its own words is unreliable, full stop.

        Config selection is a two-stage search with a held-out split: probes
        split into SELECT/CONFIRM halves; a coarse score-interpolation
        weight grid plus calibrated-RRF is scored on the select half, the
        grid is refined (±0.05/±0.10) around the select argmax, and the
        final config is the confirm-half argmax among the top select
        candidates — the shipped number is never the argmax of the same
        probes that chose it (VERDICT r3 weak #7). With `seeds > 1` the
        whole selection re-runs on independent probe draws; if the per-run
        winners disagree (mode, or weight spread > 0.1) the probe count
        doubles (<= max_probes).

        The FINAL config is chosen from stats POOLED across the runs, not
        by majority vote of per-run winners: each candidate's select/confirm
        MRR is averaged over every run that evaluated it (the coarse grid
        is identical across runs), the near-tie set within eps=0.02 of the
        best pooled select MRR is resolved canonically (median near-tie
        score weight — grid weights have reproducible identity where the
        confidence mode's continuous leg weights do not), and a different
        near-tie candidate ships only when its pooled confirm MRR wins by
        > 0.03 (above the confirm-MRR noise floor at these probe counts;
        a 0.01 margin measurably let single seeds flip the mode).
        Probe-MRR differences inside eps are noise at these probe
        counts (se ~0.035 at n=128), so the canonical pick trades nothing
        measurable for cross-draw reproducibility — which matters in
        production: a recalibration that flips the fusion mode invalidates
        the warmed serving program variant (app.warmup compiles per mode).

        embed_fn: texts -> (B, D) L2-normalized embeddings (the query path's
        own embedder). texts_of_rows: row -> doc text (None to skip rows).
        """
        rows = [r for r in self.bm25.doc_lens.keys()]
        if not rows:
            return self.leg_weights

        runs = []
        n = n_probes
        for attempt in range(2):
            runs = [self._calibrate_once(embed_fn, texts_of_rows, n,
                                         seed + i, top_k,
                                         paraphrase_fraction)
                    for i in range(max(1, seeds))]
            if any(r.get("skipped") for r in runs):
                # tiny corpus: keep equal weights but mark calibrated so the
                # next probe waits for the >20% growth trigger
                self._calibrated_at = self.engine.count
                self.last_calibration = runs[0]
                return self.leg_weights
            modes = {r["fusion_mode"] for r in runs}
            wspread = (max(r["weights"][0] for r in runs)
                       - min(r["weights"][0] for r in runs))
            if len(modes) == 1 and wspread <= 0.1:
                break
            if n >= max_probes:
                break
            n = min(n * 2, max_probes)  # unstable: re-draw with more probes

        # pooled selection (see docstring): average each candidate's
        # select/confirm MRR over the runs that evaluated it; candidates
        # must appear in EVERY run to be eligible (the coarse grid + the
        # confidence config always do; refine-stage keys may not).
        pool: Dict[str, Dict[str, list]] = {}
        for r in runs:
            for key, sc in r["probe_fused_mrr"].items():
                e = pool.setdefault(key, {"sel": [], "conf": []})
                e["sel"].append(sc["select"])
                e["conf"].append(sc["confirm"])
        full = ({k: e for k, e in pool.items() if len(e["sel"]) == len(runs)}
                or pool)
        stats = {k: (float(np.mean(e["sel"])), float(np.mean(e["conf"])))
                 for k, e in full.items()}
        top_sel = max(s for s, _ in stats.values())
        eps = 0.02
        near = sorted(k for k, (s, _) in stats.items() if s >= top_sel - eps)
        # leg-quality gate: a dense leg that cannot self-retrieve (probe MRR
        # far below bm25's) cannot help score interpolation — any nonzero
        # dense weight only perturbs bm25's correct head, and probe noise at
        # these counts can still rank such a config inside the near-tie set.
        # Confidence (calibrated RRF, which zeroes the weak leg) is the only
        # safe ship there, and the gate makes that choice deterministic.
        mrr_d_pooled = float(np.mean([r["dense_mrr"] for r in runs]))
        mrr_b_pooled = float(np.mean([r["bm25_mrr"] for r in runs]))
        score_ws = sorted(float(k.split("@")[1]) for k in near
                          if k.startswith("score@"))
        if mrr_d_pooled < 0.25 * mrr_b_pooled or not score_ws:
            best_key = "confidence"  # gate: no override can re-admit a
            # score config the leg quality rules out
        else:
            # median near-tie score weight: set membership is stable across
            # probe draws where the argmax is not, and grid weights have
            # reproducible identity (confidence's continuous cal_w does not)
            best_key = f"score@{score_ws[len(score_ws) // 2]:.2f}"
            # pooled-confirm override: must win by a margin ABOVE the probe
            # noise floor (confirm-MRR se ~0.02-0.03 at these probe counts;
            # 0.01 measurably let noise flip the mode across seeds)
            for k in near:
                if stats[k][1] > stats[best_key][1] + 0.03:
                    best_key = k
        if best_key == "confidence":
            final_mode = "confidence"
            final_w = np.asarray(
                np.median([r["confidence_weights"] for r in runs], axis=0),
                np.float32)
        else:
            final_mode = "score"
            wd = float(best_key.split("@")[1])
            final_w = np.asarray([wd, 1.0 - wd], np.float32)

        self.fusion_mode, self.leg_weights = final_mode, final_w
        self._calibrated_at = self.engine.count
        self.last_calibration = {
            **runs[0],
            "fusion_mode": final_mode,
            "weights": final_w.tolist(),
            "select_mrr": round(stats[best_key][0], 4),
            "confirm_mrr": round(stats[best_key][1], 4),
            "n_seeds": len(runs),
            "n_probes_final": n,
            "seed_configs": [
                {"mode": r["fusion_mode"], "w_dense": round(r["weights"][0], 3)}
                for r in runs],
            # near set plus the shipped key: the leg-quality gate can force
            # "confidence" even when it is outside the select near-tie set
            "pooled_near_ties": {k: {"select": round(stats[k][0], 4),
                                     "confirm": round(stats[k][1], 4)}
                                 for k in sorted(set(near) | {best_key})},
        }
        return self.leg_weights

    def _calibrate_once(self, embed_fn, texts_of_rows, n_probes: int,
                        seed: int, top_k: int,
                        paraphrase_fraction: float) -> dict:
        """One probe draw -> selected fusion config (see calibrate_fusion)."""
        from radiant_rag_tpu.ops.fusion import calibrated_leg_weights
        from radiant_rag_tpu.parallel.data import (
            make_paraphrase_query, make_pseudo_query,
        )

        rng = np.random.default_rng(seed)
        rows = [r for r in self.bm25.doc_lens.keys()]
        rng.shuffle(rows)
        probes: List[Tuple[int, str]] = []
        for r in rows:
            text = texts_of_rows(r)
            if text:
                if rng.random() < paraphrase_fraction:
                    q = make_paraphrase_query(text, rng, max_words=8)
                else:
                    q = make_pseudo_query(text, rng, max_words=8)
                probes.append((r, q))
            if len(probes) >= n_probes:
                break
        if len(probes) < 8:
            return {"skipped": "corpus too small", "n_probes": len(probes),
                    "weights": self.leg_weights.tolist()}
        q_texts = [q for _, q in probes]
        q_embs = np.asarray(embed_fn(q_texts), np.float32)
        sel = np.arange(0, len(probes), 2)  # held-out split: even=select,
        conf = np.arange(1, len(probes), 2)  # odd=confirm

        def mrr(rows_out: np.ndarray, idxs) -> float:
            rr = 0.0
            for qi in idxs:
                target = probes[qi][0]
                hits = [int(r) for r in rows_out[qi] if r >= 0]
                if target in hits:
                    rr += 1.0 / (hits.index(target) + 1)
            return rr / max(1, len(idxs))

        res = self.search_rows(q_embs, q_texts, dense_k=top_k, bm25_k=top_k,
                               fused_k=top_k, fusion="equal")
        all_idx = range(len(probes))
        mrr_d = mrr(res["dense"][1], all_idx)
        mrr_b = mrr(res["bm25"][1], all_idx)
        cal_w = np.asarray(calibrated_leg_weights([mrr_d, mrr_b]), np.float32)

        evaluated: Dict[str, Tuple[str, np.ndarray, float, float]] = {}
        saved_w, saved_mode = self.leg_weights, self.fusion_mode

        def key_of(mode, w):
            return mode if mode == "confidence" else f"score@{w[0]:.2f}"

        def eval_candidate(mode, w):
            k = key_of(mode, w)
            if k in evaluated:
                return evaluated[k]
            self.leg_weights = w
            out = self.search_rows(q_embs, q_texts, dense_k=top_k,
                                   bm25_k=top_k, fused_k=top_k, fusion=mode)
            rows_out = out["fused"][1]
            evaluated[k] = (mode, w, mrr(rows_out, sel), mrr(rows_out, conf))
            return evaluated[k]

        try:
            # stage 1: coarse grid on the select half
            for mode, w in ([("confidence", cal_w)]
                            + [("score", np.asarray([wd, 1.0 - wd], np.float32))
                               for wd in (0.15, 0.3, 0.5, 0.7, 0.85)]):
                eval_candidate(mode, w)
            # stage 2: refine around the best score weight (select half)
            score_best = max(
                (c for c in evaluated.values() if c[0] == "score"),
                key=lambda c: c[2], default=None)
            if score_best is not None:
                w0 = float(score_best[1][0])
                for dw in (-0.1, -0.05, 0.05, 0.1):
                    wd = round(min(0.95, max(0.05, w0 + dw)), 2)
                    eval_candidate(
                        "score", np.asarray([wd, 1.0 - wd], np.float32))
        finally:
            self.leg_weights, self.fusion_mode = saved_w, saved_mode

        # final choice: top-3 by select MRR, argmax by CONFIRM MRR. eps tie
        # prefers the earlier candidate — confidence-RRF first, then lower
        # dense weight — for cross-seed stability.
        ranked = sorted(evaluated.values(),
                        key=lambda c: (-c[2], c[0] != "confidence", c[1][0]))
        finalists = ranked[:3]
        best = finalists[0]
        for c in finalists[1:]:
            if c[3] > best[3] + 0.005:
                best = c
        return {
            "dense_mrr": round(mrr_d, 4), "bm25_mrr": round(mrr_b, 4),
            "weights": [float(x) for x in best[1]],
            "fusion_mode": best[0],
            "confidence_weights": [float(x) for x in cal_w],
            "probe_fused_mrr": {key_of(m, w): {"select": round(s, 4),
                                               "confirm": round(c, 4)}
                                for m, w, s, c in evaluated.values()},
            "select_mrr": round(best[2], 4),
            "confirm_mrr": round(best[3], 4),
            "n_probes": len(probes),
            "paraphrase_fraction": paraphrase_fraction,
        }

    def needs_calibration(self, growth: float = 0.2) -> bool:
        """True until calibrated, and again after the corpus grows > 20%."""
        if self._calibrated_at < 0:
            return True
        base = max(self._calibrated_at, 1)
        return (self.engine.count - self._calibrated_at) > growth * base

    def invalidate_calibration(self) -> None:
        """Force re-calibration on the next query — the growth trigger only
        couples to corpus size, so callers MUST invalidate when leg quality
        changes out-of-band: retraining/hot-swapping the embedder (a freshly
        trained dense leg would otherwise keep its random-init ~0 weight
        until the corpus grew 20%), or rebuilding BM25 with new analyzers."""
        self._calibrated_at = -1
        self.leg_weights = np.asarray([0.5, 0.5], np.float32)
        self.fusion_mode = "confidence"
        self.last_calibration = None

    def search_rows(
        self,
        queries_dense: np.ndarray,  # (B, D) L2-normalized
        queries_text: Sequence[str],
        dense_k: int = 10,
        bm25_k: int = 10,
        fused_k: int = 15,
        rrf_k: int = 60,
        mode: str = "binary",
        rescore_multiplier: float = 4.0,
        level_code: int = -1,
        lang_code: int = -1,
        bm25_mode: str = "auto",  # auto | sketch (MXU stage-1) | pages (exact)
        fusion: str = "auto",  # auto (calibration-selected) | confidence | score | equal
        select: str = "",  # stage-1 selection policy ("" = engine/env default)
        fetch: bool = True,  # False -> (device_result, unpack_fn) for pipelining
        fused_depth: Optional[int] = None,  # candidate-pool deepening: legs
        # computed + fused at this depth, fused output truncated to fused_k
        # (None = self.default_fused_depth; 0 = off). BENCH_NOTES round 4:
        # depth 32 vs 10 at 100k real text = +0.047 MRR / +0.05 hit@10.
        _qdev: Optional[jax.Array] = None,  # device-resident queries, shape
        # (engine bucket, D), pre-padded (Embedder.embed_device). When given,
        # queries_dense is ignored and the blob ships WITHOUT the fp16 dense
        # section — the embed->search hand-off stays on device (saves the
        # ~27 ms host fetch + blocking sync per serving batch on a tunneled
        # chip, plus the re-upload).
    ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        """Returns {'dense'|'bm25'|'fused': (scores (B,k), rows (B,k) i64)}."""
        eng = self.engine
        # resolve the selection policy on the host so the jitted programs'
        # static cache keys are concrete (never the env-dependent "")
        select = select or getattr(eng, "stage1_select", "") or sim._default_select()
        if fusion == "auto":  # calibration-selected mode ("confidence" until calibrated)
            fusion = self.fusion_mode
        if fused_depth is None:
            fused_depth = self.default_fused_depth
        b = len(queries_text) if _qdev is not None else queries_dense.shape[0]
        if eng.count == 0:
            empty = lambda k: (np.full((b, k), -1e30, np.float32), np.full((b, k), -1, np.int64))
            res = {"dense": empty(dense_k), "bm25": empty(bm25_k), "fused": empty(fused_k)}
            return (None, lambda: res) if not fetch else res
        self.bm25._finalize_csr()
        # Hybrid-aware bucket gate: the BM25 legs materialize a (B, N)
        # 4-byte transient regardless of the dense select mode (sketch MXU
        # accumulator is int32, pages scatter is f32), so the gate is forced
        # even under a chunked dense select, and the BM25 device arrays
        # (postings/sketch/doc-major) shrink the free-HBM transient budget.
        max_b = self.max_query_bucket()  # also runs bm25.plan_hbm
        if _qdev is not None and b > max_b:
            # oversized batches take the host chunking path below
            queries_dense = np.asarray(_qdev)[:b]
            _qdev = None
        if not fetch and b > max_b:
            # pipelining only makes sense within one device program
            res = self.search_rows(queries_dense, queries_text, dense_k, bm25_k,
                                   fused_k, rrf_k, mode, rescore_multiplier,
                                   level_code, lang_code, bm25_mode, fusion,
                                   select, fused_depth=fused_depth)
            return None, (lambda: res)
        if b > max_b:  # chunk oversized batches
            parts = [self.search_rows(queries_dense[s : s + max_b],
                                      list(queries_text[s : s + max_b]),
                                      dense_k, bm25_k, fused_k, rrf_k, mode,
                                      rescore_multiplier, level_code, lang_code,
                                      bm25_mode, fusion, select,
                                      fused_depth=fused_depth)
                     for s in range(0, b, max_b)]
            return {name: (np.concatenate([p[name][0] for p in parts]),
                           np.concatenate([p[name][1] for p in parts]))
                    for name in ("dense", "bm25", "fused")}

        q_tids_list = self.bm25.query_tids(queries_text)  # tokenize ONCE per batch
        if self.bm25.sketch_dim <= 0:
            bm25_mode = "pages"
        elif bm25_mode == "auto":
            # same routing as BM25Index.search_rows_batch (routes_pages):
            # rare-term and discriminative-term queries take the exact pages
            # program; only all-common-term traffic takes the sketch MXU
            # program. Both jit programs are compiled once.
            bm25_mode = ("pages"
                         if self.bm25.routes_pages(queries_text, q_tids_list,
                                                   num_docs=eng.capacity)
                         else "sketch")
        num_docs = eng.capacity  # bm25 doc_lens sized to match exactly

        if _qdev is not None and bm25_mode != "sketch":
            # the exact-pages program takes host-bucketed queries; this path
            # serves rare-term (low posting volume) queries, so the fetch is
            # off the hot path
            queries_dense = np.asarray(_qdev)[:b]
            _qdev = None
        qhost = None if _qdev is not None else np.asarray(queries_dense, np.float32)
        dk = min(dense_k, eng.capacity)
        bk = min(bm25_k, num_docs)
        pool = 0
        if fused_depth and fused_depth > 0:
            pool = min(int(fused_depth), eng.capacity, num_docs)
            if pool <= max(dk, bk):
                pool = 0  # legs already at least this deep — nothing to gain
        dk_eff, bk_eff = (max(dk, pool), max(bk, pool)) if pool else (dk, bk)
        fk = min(fused_k, dk_eff + bk_eff)
        kc = min(max(dk_eff, int(round(dk_eff * rescore_multiplier))),
                 eng.capacity)
        bq = eng._bucket_of(b)
        common = (
            eng.vecs, eng.codes, eng.i8, *qz.int8_scale_offset(eng.i8_lo, eng.i8_hi),
            eng.valid, eng.level, eng.lang,
        )

        if bm25_mode == "sketch":
            self.bm25.ensure_sketch(num_docs)
            self.bm25.ensure_doc_major(num_docs)
            self.bm25._device_doc_lens(num_docs)
            q_bins = self.bm25.make_query_bins(queries_text, q_tids_list)
            q_tids, q_idfs = self.bm25.make_query_terms(queries_text, tids=q_tids_list)
            if q_tids.shape[0] < bq:
                pad = bq - q_tids.shape[0]
                q_bins = np.pad(q_bins, ((0, pad), (0, 0)))  # 0 = pad (signed-bin encoding)
                q_tids = np.pad(q_tids, ((0, pad), (0, 0)), constant_values=-1)
                q_idfs = np.pad(q_idfs, ((0, pad), (0, 0)))
            bm_kc = min(max(bk_eff, int(round(bk_eff * rescore_multiplier))),
                        num_docs)
            # ONE h2d upload per batch (fp16 queries + sparse bins; see
            # pack_query_blob) — per-batch transfer cost dominated the fused
            # program itself at <=100k docs before this.
            if _qdev is not None:
                # device-resident queries: the blob ships WITHOUT its fp16
                # dense section (d=0 layout) and the program takes _qdev raw
                if _qdev.shape != (bq, eng.dim):
                    raise ValueError(
                        f"_qdev shape {_qdev.shape} != bucket ({bq}, {eng.dim});"
                        " pad with Embedder.embed_device(texts, pad_to=bucket)")
                qpad = np.zeros((bq, 0), np.float32)
            else:
                qpad = np.zeros((bq, eng.dim), np.float32)
                qpad[:b] = qhost
            blob = pack_query_blob(qpad, q_tids, q_idfs, q_bins, b,
                                   level_code, lang_code, self.leg_weights,
                                   self.bm25.sketch_dim,
                                   avgdl=float(self.bm25.avgdl))
            sketch_args = (
                *common,
                self.bm25._sketch, self.bm25._sketch_scale,
                self.bm25._dm_tids, self.bm25._dm_tfs,
                self.bm25._dl_dev,
                jnp.asarray(blob), bq, int(q_tids.shape[1]),
                dk, bk, fk, rrf_k, kc, bm_kc, mode,
                self.bm25.k1, self.bm25.b, fusion, select, pool,
            )
            if _qdev is not None:
                packed = _hybrid_program_sketch_blob_qdev(_qdev, *sketch_args)
            else:
                packed = _hybrid_program_sketch_blob(*sketch_args)
        else:
            qdev, qvalid, _ = eng._bucket_queries(qhost)
            codes_args = (
                qdev, qvalid,
                jnp.asarray(level_code, jnp.int32), jnp.asarray(lang_code, jnp.int32),
                jnp.asarray(self.leg_weights, jnp.float32),
            )
            self.bm25._device_doc_lens(num_docs)
            assert self.bm25._dl_size == num_docs, (self.bm25._dl_size, num_docs)
            dl = self.bm25._dl_dev
            pages = self.bm25.make_pages(queries_text, q_tids_list)
            packed = _hybrid_program(
                *common,
                self.bm25._dev_post_rows, self.bm25._dev_post_tf,
                jnp.asarray(pages["start"]), jnp.asarray(pages["len"]),
                jnp.asarray(pages["qidx"]), jnp.asarray(pages["idf"]),
                dl, jnp.asarray(self.bm25.avgdl, jnp.float32),
                *codes_args,
                dk, bk, fk, rrf_k, kc, mode, bq, num_docs,
                self.bm25.k1, self.bm25.b, fusion, select, pool,
            )
        if not fetch:
            # pipelining seam: hand back the in-flight device result so the
            # caller can dispatch the NEXT batch before this one's
            # device->host transfer — JAX's async dispatch then overlaps the
            # fixed fetch latency (~30 ms through tunnels) with the next
            # batch's compute. unpack() blocks and decodes when called.
            return packed, (lambda p=packed, bb=b, dk_=dk, bk_=bk, fk_=fk:
                            self._unpack(np.asarray(p)[:bb], dk_, bk_, fk_))
        return self._unpack(np.asarray(packed)[:b], dk, bk, fk)

    @staticmethod
    def _unpack(packed: np.ndarray, dk: int, bk: int, fk: int
                ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        off = 0
        for name, k in (("dense", dk), ("bm25", bk), ("fused", fk)):
            scores = packed[:, off : off + k]
            rows = packed[:, off + k : off + 2 * k].astype(np.int64)
            out[name] = (scores.copy(), rows)
            off += 2 * k
        return out
