"""Device BM25 scoring over a device-resident CSR impact index.

Replaces the reference's hottest CPU loop — `BM25Index.search` iterating every
document per query term with `tokens.count(term)`, O(terms x docs x doclen)
(`storage/bm25_index.py:218-270`).

Two kernels:

  bm25_pages_score_topk  (primary) — postings live ON DEVICE as concatenated
      CSR arrays (rows, tf, sorted by term). A query batch ships only a tiny
      page table: each page is (posting_start, valid_len, query_idx, idf)
      covering PAGE_SIZE consecutive postings of one query term. The kernel
      gathers pages, computes all BM25 contributions vectorized, scatter-adds
      them into per-query dense score rows, and top-ks — one device program,
      KBs of host->device traffic per batch instead of the posting lists
      themselves.

  bm25_score_topk  (simple) — host-gathered padded postings; kept for small
      indexes and as a reference implementation for tests.

BM25 semantics match the reference exactly (SURVEY.md §7.4.6):
  idf(t)    = ln((n - df + 0.5)/(df + 0.5) + 1)            (`bm25_index.py:134`)
  score(d)  = sum_t idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl_d/avgdl))
  k1 = 1.5, b = 0.75                                        (`config.py:394-395`)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar: module-level jnp would init the XLA backend at import,
# breaking jax.distributed.initialize (DCN).
NEG_INF = np.float32(-1e30)

from radiant_rag_tpu.ops.similarity import full_topk  # noqa: E402


@partial(jax.jit, static_argnames=("k", "num_docs"))
def bm25_score_topk(
    rows: jax.Array,  # (B, P) int32 posting doc rows, -1 = pad
    tfs: jax.Array,  # (B, P) f32 term frequencies
    idfs: jax.Array,  # (B, P) f32 idf of the posting's term
    doc_lens: jax.Array,  # (N,) f32 token counts per doc row
    avgdl: jax.Array,  # () f32
    mask: jax.Array,  # (N,) bool valid-row mask (or None)
    k: int,
    num_docs: int,
    k1: float = 1.5,
    b: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (B,k), rows (B,k) int32, -1 for empty)."""
    safe_rows = jnp.maximum(rows, 0)
    dl = doc_lens[safe_rows]  # (B, P)
    denom = tfs + k1 * (1.0 - b + b * dl / jnp.maximum(avgdl, 1e-6))
    contrib = idfs * tfs * (k1 + 1.0) / jnp.maximum(denom, 1e-6)
    contrib = jnp.where(rows >= 0, contrib, 0.0)

    def scatter_one(r, c):
        return jnp.zeros((num_docs,), jnp.float32).at[r].add(c, mode="drop", indices_are_sorted=False)

    # rows<0 were zeroed; scatter them to row 0 harmlessly via safe_rows+zero contrib
    scores = jax.vmap(scatter_one)(safe_rows, contrib)  # (B, N)
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    top_s, top_i = jax.lax.top_k(scores, k)
    top_i = jnp.where(top_s > 0.0, top_i, -1)
    return top_s, top_i.astype(jnp.int32)


PAGE_SIZE = 2048


def bm25_pages_scores(
    post_rows: jax.Array,  # (Ptot,) int32 device-resident posting doc rows
    post_tf: jax.Array,  # (Ptot,) f32 term frequencies
    page_start: jax.Array,  # (Pg,) int32 posting offset of each page
    page_len: jax.Array,  # (Pg,) int32 valid postings in page (0 = dead page)
    page_qidx: jax.Array,  # (Pg,) int32 which query the page belongs to
    page_idf: jax.Array,  # (Pg,) f32 idf of the page's term
    doc_lens: jax.Array,  # (N,) f32
    avgdl: jax.Array,  # () f32
    mask: jax.Array,  # (N,) bool or None
    b_queries: int,
    num_docs: int,
    k1: float = 1.5,
    b: float = 0.75,
) -> jax.Array:
    """Dense (B, N) BM25 scores from device CSR postings + a host page table."""
    pg = page_start.shape[0]
    ptot = post_rows.shape[0]
    offs = jax.lax.broadcasted_iota(jnp.int32, (pg, PAGE_SIZE), 1)
    idx = jnp.minimum(page_start[:, None] + offs, ptot - 1)
    valid = offs < page_len[:, None]
    rows = jnp.take(post_rows, idx)  # (Pg, PAGE)
    tfs = jnp.take(post_tf, idx)
    dl = jnp.take(doc_lens, jnp.minimum(rows, num_docs - 1))
    denom = tfs + k1 * (1.0 - b + b * dl / jnp.maximum(avgdl, 1e-6))
    contrib = page_idf[:, None] * tfs * (k1 + 1.0) / jnp.maximum(denom, 1e-6)
    contrib = jnp.where(valid, contrib, 0.0)
    # 2-D scatter-add: (query, row) index pairs into the (B, N) score
    # matrix. The previous flattened form indexed a (B*N,) buffer, which
    # hits EXACTLY 2^31 elements at b=2048 x a 1M-padded corpus — int32
    # index arithmetic overflowed at trace time and any large batch routed
    # to the pages program crashed (found by the round-5 1M cost study).
    # Invalid slots scatter to (0, 0) with their contrib already zeroed
    # above — a harmless +0.0.
    q_i = jnp.where(valid, jnp.broadcast_to(page_qidx[:, None], rows.shape), 0)
    r_i = jnp.where(valid, rows, 0)
    scores = jnp.zeros((b_queries, num_docs), jnp.float32).at[
        q_i.reshape(-1), r_i.reshape(-1)
    ].add(contrib.reshape(-1), mode="drop")
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    else:
        scores = jnp.where(scores > 0.0, scores, NEG_INF)
    return scores


@partial(jax.jit, static_argnames=("b_queries", "num_docs", "k", "k1", "b"))
def bm25_pages_score_topk(
    post_rows, post_tf, page_start, page_len, page_qidx, page_idf,
    doc_lens, avgdl, mask, b_queries: int, num_docs: int, k: int,
    k1: float = 1.5, b: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """Page-table BM25 + top-k; returns (scores (B,k), rows (B,k), -1 pad)."""
    scores = bm25_pages_scores(
        post_rows, post_tf, page_start, page_len, page_qidx, page_idf,
        doc_lens, avgdl, mask, b_queries, num_docs, k1, b,
    )
    top_s, top_i = full_topk(scores, k)
    top_i = jnp.where(top_s > 0.0, top_i, -1)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Impact-sketch BM25: stage-1 scoring as an int8 MXU matmul.
#
# Every posting's full BM25 contribution w(t,d) = idf_t * tf(k1+1)/(tf +
# k1(1-b+b*dl/avgdl)) is precomputable at index-finalize time. Hashing terms
# into S bins gives each doc a dense S-dim "impact sketch"; a query becomes a
# {0,1} indicator over its unique terms' bins, and
#       score(q, d) = indicator_q . sketch_d
# equals exact BM25 up to hash-collision noise (doc fill ~48/2048 bins). The
# scan is then identical in shape to the dense int8 scan: one int8 x int8
# matmul on the MXU — no scatter, no per-query posting traffic. Exact scoring
# (bm25_pages_score_topk) remains for the parity API and for rescoring.
# ---------------------------------------------------------------------------


def bm25_sketch_select(
    sketch: jax.Array,  # (N, S) int8 quantized impact sketches
    scale: jax.Array,  # () f32 dequant scale
    qind: jax.Array,  # (B, S) int8 query bin indicators
    mask: jax.Array,  # (N,) bool or None
    k: int,
    select: str = "",
) -> Tuple[jax.Array, jax.Array]:
    """Sketch-scan candidate selection under the stage-1 selection policy
    (`ops/similarity.select_topk`): the int32 accumulator is selected in bf16
    (scale > 0 makes ordering invariant), or chunked so the (B, N) buffer
    never materializes. Returns (scores f32, rows i32); rows are -1 where the
    doc shares no query bin (raw <= 0) or was masked."""
    from radiant_rag_tpu.ops.similarity import (
        _default_select, _sel_valid, blockmax_select, chunked_scan_select,
        select_topk,
    )

    select = select or _default_select()

    def score_chunk(c):  # (C, S) int8 -> (B, C) int32
        return jax.lax.dot_general(
            qind, c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    if select == "blockmax":
        raw_s, cand = blockmax_select(sketch, qind.astype(jnp.int8), mask, k)
    elif select == "bf16_chunked":
        raw_s, cand = chunked_scan_select(sketch, mask, k, score_chunk)
    else:
        raw_s, cand = select_topk(score_chunk(sketch), mask, k, select)
    valid = _sel_valid(raw_s) & (raw_s > 0)
    top_s = jnp.where(valid, raw_s.astype(jnp.float32) * scale, NEG_INF)
    cand = jnp.where(valid, cand, -1)
    return top_s, cand.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "select"))
def bm25_sketch_topk(
    sketch: jax.Array,  # (N, S) int8 quantized impact sketches
    scale: jax.Array,  # () f32 dequant scale
    qind: jax.Array,  # (B, S) int8 query bin indicators
    mask: jax.Array,  # (N,) bool or None
    k: int,
    select: str = "",
) -> Tuple[jax.Array, jax.Array]:
    return bm25_sketch_select(sketch, scale, qind, mask, k, select)


def bm25_sketch_scores(sketch, scale, qind, mask):
    """Dense (B, N) sketch scores (for fusion inside larger programs)."""
    raw = jax.lax.dot_general(
        qind, sketch,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    return scores


def bm25_candidate_rescore(
    doc_tids: jax.Array,  # (N, L) int32 per-doc term ids, -1 pad (doc-major)
    doc_tfs: jax.Array,  # (N, L) int32 term frequencies
    doc_lens: jax.Array,  # (N,) f32
    avgdl: jax.Array,  # () f32
    cand: jax.Array,  # (B, KC) int32 candidate rows, -1 pad
    q_tids: jax.Array,  # (B, T) int32 query term ids, -1 pad
    q_idfs: jax.Array,  # (B, T) f32
    k1: float = 1.5,
    b: float = 0.75,
) -> jax.Array:
    """EXACT BM25 scores for candidate docs (stage-2 after the sketch scan).

    Doc-major term tables make per-candidate term lookup a dense equality
    join: (B, KC, L) gathered doc terms vs (B, T) query terms -> tf matrix ->
    the standard BM25 sum. No scatter, no postings traversal — O(B*KC*L*T)
    dense compares on the VPU (all dims small)."""
    safe = jnp.maximum(cand, 0)
    d_tids = jnp.take(doc_tids, safe, axis=0)  # (B, KC, L)
    d_tfs = jnp.take(doc_tfs, safe, axis=0).astype(jnp.float32)
    dl = jnp.take(doc_lens, safe)  # (B, KC)
    # tf of each query term in each candidate: match term ids
    eq = (d_tids[:, :, :, None] == q_tids[:, None, None, :]) \
        & (d_tids[:, :, :, None] >= 0)  # (B, KC, L, T)
    tf = jnp.sum(jnp.where(eq, d_tfs[:, :, :, None], 0.0), axis=2)  # (B, KC, T)
    denom = tf + k1 * (1.0 - b + b * dl[:, :, None] / jnp.maximum(avgdl, 1e-6))
    contrib = q_idfs[:, None, :] * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-6)
    contrib = jnp.where(q_tids[:, None, :] >= 0, contrib, 0.0)
    scores = jnp.sum(contrib, axis=-1)  # (B, KC)
    return jnp.where(cand >= 0, scores, NEG_INF)


@partial(jax.jit, static_argnames=("k", "kc", "k1", "b", "select"))
def bm25_sketch_rescore_topk(
    sketch: jax.Array,  # (N, S) int8
    scale: jax.Array,  # () f32
    qind: jax.Array,  # (B, S) int8
    dm_tids: jax.Array,  # (N, L) doc-major term ids
    dm_tfs: jax.Array,  # (N, L)
    doc_lens: jax.Array,  # (N,)
    avgdl: jax.Array,  # ()
    q_tids: jax.Array,  # (B, T)
    q_idfs: jax.Array,  # (B, T)
    mask: jax.Array,  # (N,) bool or None
    k: int,
    kc: int,
    k1: float = 1.5,
    b: float = 0.75,
    select: str = "",
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage BM25: sketch matmul scan -> EXACT candidate rescore -> top-k.

    Returned scores are exact BM25 (the rescore); stage-1 sketch noise only
    affects recall at the candidate margin (mitigated by kc = k x multiplier).
    ~10x faster than the exact page-table path on common-term queries because
    no posting scatter happens at query time."""
    from radiant_rag_tpu.ops.similarity import sort_candidates_by_row

    _s1, cand = bm25_sketch_select(sketch, scale, qind, mask, kc, select)
    cand = sort_candidates_by_row(cand)  # exact-path tie-break parity
    exact = bm25_candidate_rescore(dm_tids, dm_tfs, doc_lens, avgdl,
                                   cand, q_tids, q_idfs, k1, b)
    top_s, sel = jax.lax.top_k(exact, k)
    top_i = jnp.take_along_axis(cand, sel, axis=1)
    top_i = jnp.where(top_s > 0.0, top_i, -1)
    return top_s, top_i
