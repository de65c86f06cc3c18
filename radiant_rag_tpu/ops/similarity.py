"""Similarity scans + top-k: the device-resident replacements for ANN search.

Replaces the reference's delegated KNN paths — RediSearch HNSW
(`storage/redis_store.py:689-755`), pgvector (`pgvector_store.py:725-748`),
the numpy linear-scan fallback (`redis_store.py:863-952`), and the python
rescore loop (`storage/quantization.py:185-222`) — with fused XLA programs:

  exact_topk         fp32/bf16 cosine scan on the MXU + lax.top_k
  hamming_scan_topk  XOR + popcount over packed uint32 sign codes (VPU)
  int8_scan_topk     asymmetric int8 scan as an int8xint8 MXU matmul with the
                     per-dim dequant scales folded into the query
  two_stage_topk     fused stage-1 quantized scan -> candidate gather ->
                     fp32 rescore -> final top-k, all in one jit program
                     (the two-stage path the reference implements but never
                     wires into its pipeline — SURVEY.md §2.1 gap; here it is
                     the default engine)

All scans take a validity mask (row filters for doc_level / language /
deletions — reference encodes these as RediSearch TagField filters,
`redis_store.py:260-276`; here they are vectorized masks).

Scores are cosine similarities (corpus and queries are L2-normalized by the
caller; reference stores normalized vectors and maps distance -> similarity =
1 - d, `redis_store.py:744-745`).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars (not jnp): module-level jnp.asarray would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize (DCN).
NEG_INF = np.float32(-1e30)

# --- stage-1 candidate selection policy -------------------------------------
# Stage-1 scans exist only to pick candidates; exact ordering is recovered by
# the fp32 rescore. Per-query dequant scales are positive, so selection order
# is invariant under the affine dequant — the (B, N) buffer the top-k reads
# can therefore be the RAW accumulator converted to bf16 (monotone; ties at
# the 8-bit-mantissa margin are absorbed by the rescore multiplier). That
# halves the dominant HBM traffic at large batch (VERDICT r1 #4: two (B,N)
# f32 buffers ~4 GB each at B=1024 x 1M). "chunked" additionally runs the
# scan as a lax.map over corpus chunks with per-chunk top-k (top-k of
# per-chunk exact top-ks == global top-k) so the full (B, N) buffer is never
# alive at once. select="" resolves to the env default at trace time.
SELECT_NEG = np.asarray(-3e38, jnp.bfloat16)
SCAN_CHUNK = int(os.environ.get("RAD_SCAN_CHUNK", "131072"))


def _default_select() -> str:
    """Process default for stage-1 candidate selection. f32 by measurement:
    at 1M docs x B=1024 on the real chip, full-hybrid batch latency was
    98.7 ms (f32) vs 107.1 ms (bf16) and standalone two-stage 32.5 vs
    35.7 ms — the predicted HBM win from halving the (B, N) score buffer
    did not materialize (the scan is already hiding score traffic behind
    the int8 matmul); bf16 remains the HBM-capacity option and
    bf16_chunked the bounded-footprint option. Callers should resolve this
    BEFORE the jit boundary so compiled-program cache keys are concrete."""
    return os.environ.get("RAD_STAGE1_SELECT", "f32")


def select_topk(
    scores_raw: jax.Array,  # (B, N) int32/f32 raw stage-1 accumulators
    mask: Optional[jax.Array],  # (N,) bool or None
    k: int,
    select: str,  # "" -> env default | f32 | bf16 | bf16_chunked
) -> Tuple[jax.Array, jax.Array]:
    """Monolithic candidate selection over a materialized score matrix.

    Returns (sel_scores bf16/f32, idx i32); invalid slots <= SELECT_NEG/2."""
    select = select or _default_select()
    if select == "f32":
        s = _masked(scores_raw.astype(jnp.float32), mask)
        top_s, top_i = full_topk(s, k)
        return top_s, top_i.astype(jnp.int32)
    s = scores_raw.astype(jnp.bfloat16)
    if mask is not None:
        s = jnp.where(mask[None, :], s, SELECT_NEG)
    top_s, top_i = full_topk(s, k)
    return top_s, top_i.astype(jnp.int32)


def chunked_scan_select(
    corpus_rows: jax.Array,  # (N, ...) per-row stage-1 operand (codes)
    mask: Optional[jax.Array],  # (N,) bool or None
    k: int,
    score_chunk_fn,  # (chunk_rows (C, ...)) -> (B, C) raw scores
    chunk: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked scan: lax.map over corpus chunks, per-chunk bf16 top-k, exact
    merge. The (B, N) score matrix is never materialized — peak transient is
    (B, chunk). Exact w.r.t. the per-chunk selector (top-k of per-chunk
    top-ks == global top-k)."""
    n = corpus_rows.shape[0]
    chunk = chunk or SCAN_CHUNK
    while chunk > n:
        chunk //= 2
    chunk = max(chunk, 1)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        corpus_rows = jnp.pad(corpus_rows, ((0, n_pad - n),) + ((0, 0),) * (corpus_rows.ndim - 1))
    m = mask if mask is not None else jnp.ones((n,), bool)
    if n_pad != n:
        m = jnp.pad(m, (0, n_pad - n))
    nc = n_pad // chunk
    kc = min(k, chunk)

    def body(xs):
        rows_c, mask_c = xs
        raw = score_chunk_fn(rows_c)  # (B, C)
        s = jnp.where(mask_c[None, :], raw.astype(jnp.bfloat16), SELECT_NEG)
        return full_topk(s, kc)

    ts, ti = jax.lax.map(body, (corpus_rows.reshape((nc, chunk) + corpus_rows.shape[1:]),
                                m.reshape(nc, chunk)))  # (nc, B, kc)
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)[:, None, None]
    ti = ti.astype(jnp.int32) + base
    b = ts.shape[1]
    ts = jnp.moveaxis(ts, 0, 1).reshape(b, nc * kc)
    ti = jnp.moveaxis(ti, 0, 1).reshape(b, nc * kc)
    top_s, sel = jax.lax.top_k(ts, min(k, nc * kc))
    top_i = jnp.take_along_axis(ti, sel, axis=1)
    if k > nc * kc:  # degenerate tiny-corpus case
        pad = k - nc * kc
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=SELECT_NEG)
        top_i = jnp.pad(top_i, ((0, 0), (0, pad)))
    return top_s, top_i

# Exact lax.top_k over a full corpus axis compiles pathologically slowly on
# TPU once k exceeds the fast path (~16); jax.lax.approx_max_k is the
# TPU-native partial-reduce designed for candidate generation (recall ~0.98 at
# k=40 on 131k rows, 100x faster compiles). Exact top_k remains for small k
# and for final selection over already-shortlisted candidates.
EXACT_TOPK_MAX_K = 16


def full_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a (B, N) score matrix; approximate for large k."""
    if k <= EXACT_TOPK_MAX_K or k >= scores.shape[-1] // 4:
        return jax.lax.top_k(scores, k)
    return jax.lax.approx_max_k(scores, k)


def _masked(scores: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return scores
    return jnp.where(mask[None, :], scores, NEG_INF)


@partial(jax.jit, static_argnames=("k",))
def exact_topk(
    corpus: jax.Array,  # (N, D) float, L2-normalized
    queries: jax.Array,  # (B, D) float, L2-normalized
    mask: Optional[jax.Array],  # (N,) bool or None
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact cosine top-k: one MXU matmul + lax.top_k.

    Returns (scores (B, k) f32, indices (B, k) i32).
    """
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype),
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = _masked(scores, mask)
    top_s, top_i = full_topk(scores, k)
    return top_s, top_i.astype(jnp.int32)


HAMMING_CHUNK = 8192


def _sel_valid(raw_s: jax.Array) -> jax.Array:
    """True where a selected slot holds a real (unmasked) candidate."""
    thresh = SELECT_NEG / 2 if raw_s.dtype == jnp.bfloat16 else NEG_INF / 2
    return raw_s > thresh


def sort_candidates_by_row(cand: jax.Array) -> jax.Array:
    """Sort a (B, KC) candidate-row matrix ascending, -1 pads pushed to the
    end. Rescore stages top-k over rescored scores with positional tie-break;
    row-sorted candidates make that tie-break "lowest row wins" — identical to
    a full-matrix lax.top_k — so two-stage results are deterministic and
    agree with the exact path even when stage-1 selection reorders ties."""
    big = jnp.int32(2**30)
    c = jnp.where(cand < 0, big, cand.astype(jnp.int32))
    c = jnp.sort(c, axis=1)
    return jnp.where(c >= big, -1, c)


@partial(jax.jit, static_argnames=("k", "select"))
def hamming_scan_topk(
    codes: jax.Array,  # (N, W) uint32 packed sign bits
    qcodes: jax.Array,  # (B, W) uint32
    mask: Optional[jax.Array],  # (N,) bool or None
    k: int,
    select: str = "",
) -> Tuple[jax.Array, jax.Array]:
    """Binary Hamming scan over packed codes.

    Processes the corpus in fixed row chunks via `lax.map`: the (B, chunk, W)
    XOR+popcount body is compiled ONCE and looped, so compile time is flat in
    N while peak memory stays O(B*chunk) — candidate selection happens
    per-chunk inside the loop (top-k of per-chunk top-ks == global top-k), so
    the (B, N) score matrix never materializes. (A word-at-a-time fori over
    full-N broadcasts compiled catastrophically slowly at 100k+ rows on
    TPU — 200s+ vs ~1s for this form.) Returns scores as (D - 2*hamming)/D —
    the cosine of the sign vectors — so stage-1 scores share the rescore
    scale.
    """
    n, w = codes.shape
    dim = w * 32
    select = select or _default_select()

    from radiant_rag_tpu.ops.pallas_kernels import TILE_N, hamming_scores_pallas, use_pallas

    if use_pallas() and n % TILE_N == 0 and jax.default_backend() != "cpu":
        hamming = hamming_scores_pallas(codes, qcodes)
        raw_s, top_i = select_topk(dim - 2 * hamming, mask, k, select)
    else:

        def body(c):  # c: (chunk, W) -> (B, chunk) raw = dim - 2*hamming
            x = jax.lax.population_count(c[None, :, :] ^ qcodes[:, None, :])
            return dim - 2 * jnp.sum(x.astype(jnp.int32), axis=-1)

        raw_s, top_i = chunked_scan_select(codes, mask, k, body, chunk=HAMMING_CHUNK)
    valid = _sel_valid(raw_s)
    top_s = jnp.where(valid, raw_s.astype(jnp.float32) / dim, NEG_INF)
    return top_s, top_i.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "select"))
def int8_scan_topk(
    codes: jax.Array,  # (N, D) int8
    queries: jax.Array,  # (B, D) f32 (unquantized)
    scale: jax.Array,  # (D,) f32 per-dim dequant scale s
    offset: jax.Array,  # (D,) f32 per-dim dequant offset o
    mask: Optional[jax.Array],
    k: int,
    select: str = "",
) -> Tuple[jax.Array, jax.Array]:
    """Asymmetric int8 scan as an int8 x int8 MXU matmul.

    score(q, c) = q . (c*s + o) = sum_d (q_d s_d) c_d + q.o.  The per-dim
    scale is folded into the query, the folded query is symmetric-quantized to
    int8, and the N x D corpus matmul runs entirely in int8 on the MXU
    (int32 accumulation). Candidate selection runs on the raw accumulator
    (order-invariant: sq > 0) per the module selection policy; stage-2 fp32
    rescoring recovers exact ordering for the survivors, so stage-1
    quantization noise only affects recall at the candidate margin.
    """
    qs = queries * scale[None, :]  # (B, D) fold dequant scale
    qmax = jnp.max(jnp.abs(qs), axis=1, keepdims=True) + 1e-12
    sq = qmax / 127.0  # per-query symmetric scale
    qi = jnp.clip(jnp.round(qs / sq), -127, 127).astype(jnp.int8)
    select = select or _default_select()

    def score_chunk(c):  # (C, D) int8 -> (B, C) int32
        return jax.lax.dot_general(
            qi, c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    if select == "blockmax":
        raw_s, top_i = blockmax_select(codes, qi, mask, k)
    elif select == "bf16_chunked":
        raw_s, top_i = chunked_scan_select(codes, mask, k, score_chunk)
    else:
        raw_s, top_i = select_topk(score_chunk(codes), mask, k, select)
    const = queries @ offset  # (B,)
    valid = _sel_valid(raw_s)
    top_s = jnp.where(valid, raw_s.astype(jnp.float32) * sq + const[:, None], NEG_INF)
    return top_s, top_i.astype(jnp.int32)


def blockmax_select(
    codes: jax.Array,  # (N, D) int8 corpus-side operand
    qi: jax.Array,  # (B, D) int8 query-side operand
    mask: Optional[jax.Array],
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Candidate selection via the Pallas block-max kernel: per-tile top-2 in
    VMEM (`ops/pallas_kernels.blockmax2_pallas`), then top-k over the
    (B, 2*n_tiles) tile winners — the (B, N) accumulator never reaches HBM.
    Falls back to monolithic bf16 selection when N isn't tile-aligned (engine
    capacities are pow2 >= 1024, so the real engine always qualifies).
    Returns (raw scores f32 — exact int32 accumulators, rows i32; invalid
    slots <= NEG_INF/2 with row -1)."""
    from radiant_rag_tpu.ops.pallas_kernels import BLOCKMAX_TILE, blockmax2_pallas

    n = codes.shape[0]
    if n % BLOCKMAX_TILE != 0 or n // BLOCKMAX_TILE < 2:
        def score_chunk(c):
            return jax.lax.dot_general(
                qi, c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        raw_s, top_i = select_topk(score_chunk(codes), mask, k, "bf16")
        valid = _sel_valid(raw_s)
        return (jnp.where(valid, raw_s.astype(jnp.float32), NEG_INF),
                jnp.where(valid, top_i, -1))
    m = mask if mask is not None else jnp.ones((n,), bool)
    tile_s, tile_rows = blockmax2_pallas(
        codes, qi, m, interpret=jax.default_backend() == "cpu")
    nt2 = tile_s.shape[1]
    s = jnp.where(tile_rows >= 0, tile_s.astype(jnp.float32), NEG_INF)
    kk = min(k, nt2)
    top_s, sel = full_topk(s, kk)
    top_i = jnp.take_along_axis(tile_rows, sel, axis=1)
    if kk < k:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i


@partial(jax.jit, static_argnames=("k", "k_candidates", "stage1", "select"))
def two_stage_topk(
    corpus: jax.Array,  # (N, D) fp32/bf16 vectors for rescoring
    queries: jax.Array,  # (B, D) f32
    mask: Optional[jax.Array],
    k: int,
    k_candidates: int,
    stage1: str,  # "hamming" | "int8"
    binary_codes: Optional[jax.Array] = None,  # (N, W) uint32
    qbinary: Optional[jax.Array] = None,  # (B, W) uint32
    int8_codes: Optional[jax.Array] = None,  # (N, D) int8
    int8_scale: Optional[jax.Array] = None,
    int8_offset: Optional[jax.Array] = None,
    select: str = "",
) -> Tuple[jax.Array, jax.Array]:
    """Fused quantized retrieval: stage-1 scan -> gather -> fp32 rescore -> top-k.

    This is the default query engine, corresponding to the reference's
    `retrieve_by_embedding_quantized` with rescore_multiplier
    (`redis_store.py:757-861`, `quantization.py:185-222`) but fused into a
    single device program: candidates never round-trip to the host.
    """
    if stage1 == "hamming":
        s1, cand = hamming_scan_topk(binary_codes, qbinary, mask, k_candidates, select)
    elif stage1 == "int8":
        s1, cand = int8_scan_topk(int8_codes, queries, int8_scale, int8_offset, mask,
                                  k_candidates, select)
    else:
        raise ValueError(f"unknown stage1: {stage1}")

    # Gather candidate vectors and rescore. Full fp32 when the corpus keeps
    # fp32 vectors resident; otherwise (fp32-free memory mode) rescore against
    # dequantized int8 — still a large accuracy step up from stage-1 scores.
    # Candidates masked out in stage 1 (-inf) must stay invalid afterwards.
    cand = jnp.where(s1 > NEG_INF / 2, cand, -1)
    cand = sort_candidates_by_row(cand)
    safe = jnp.maximum(cand, 0)
    if corpus.shape[0] > 0:
        cand_vecs = jnp.take(corpus, safe, axis=0).astype(jnp.float32)  # (B, kc, D)
    else:
        cand_i8 = jnp.take(int8_codes, safe, axis=0).astype(jnp.float32)
        cand_vecs = cand_i8 * int8_scale[None, None, :] + int8_offset[None, None, :]
    rescored = jnp.einsum("bd,bkd->bk", queries, cand_vecs)
    rescored = jnp.where(cand >= 0, rescored, NEG_INF)
    top_s, local_i = jax.lax.top_k(rescored, k)
    top_idx = jnp.take_along_axis(cand, local_i, axis=1)
    return top_s, top_idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "k_candidates"))
def two_stage_topk_pallas(
    corpus: jax.Array,  # (N, D) fp32/bf16 (or (0, D) in fp32-free mode)
    queries: jax.Array,  # (B, D) f32
    mask: jax.Array,  # (N,) bool
    k: int,
    k_candidates: int,
    int8_codes: jax.Array,  # (N, D) int8
    int8_scale: jax.Array,
    int8_offset: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage retrieval with the Pallas fused scan->top-K stage 1.

    Identical semantics to two_stage_topk(stage1="int8") but stage 1 never
    materializes (B, N) scores in HBM (`ops/pallas_kernels.py`). Requires
    N % TILE_N == 0 (engine capacities are powers of two >= 1024)."""
    from radiant_rag_tpu.ops.pallas_kernels import int8_scan_topk_pallas

    qs = queries * int8_scale[None, :]
    qmax = jnp.max(jnp.abs(qs), axis=1, keepdims=True) + 1e-12
    sq = qmax / 127.0
    qi = jnp.clip(jnp.round(qs / sq), -127, 127).astype(jnp.int8)
    raw_s, cand = int8_scan_topk_pallas(int8_codes, qi, mask, k_candidates)
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    if corpus.shape[0] > 0:
        cand_vecs = jnp.take(corpus, safe, axis=0).astype(jnp.float32)
    else:
        ci = jnp.take(int8_codes, safe, axis=0).astype(jnp.float32)
        cand_vecs = ci * int8_scale[None, None, :] + int8_offset[None, None, :]
    rescored = jnp.einsum("bd,bkd->bk", queries, cand_vecs)
    rescored = jnp.where(valid, rescored, NEG_INF)
    top_s, sel = jax.lax.top_k(rescored, k)
    top_i = jnp.take_along_axis(cand, sel, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i.astype(jnp.int32)
