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

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)

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


@partial(jax.jit, static_argnames=("k",))
def hamming_scan_topk(
    codes: jax.Array,  # (N, W) uint32 packed sign bits
    qcodes: jax.Array,  # (B, W) uint32
    mask: Optional[jax.Array],  # (N,) bool or None
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Binary Hamming scan over packed codes.

    Processes the corpus in fixed row chunks via `lax.map`: the (B, chunk, W)
    XOR+popcount body is compiled ONCE and looped, so compile time is flat in
    N while peak memory stays O(B*chunk*W + B*N). (A word-at-a-time fori over
    full-N broadcasts compiled catastrophically slowly at 100k+ rows on
    TPU — 200s+ vs ~1s for this form.) Returns scores as (D - 2*hamming)/D —
    the cosine of the sign vectors — so stage-1 scores share the rescore
    scale.
    """
    n, w = codes.shape
    b = qcodes.shape[0]
    dim = w * 32

    from radiant_rag_tpu.ops.pallas_kernels import TILE_N, hamming_scores_pallas, use_pallas

    if use_pallas() and n % TILE_N == 0 and jax.default_backend() != "cpu":
        hamming = hamming_scores_pallas(codes, qcodes)
    else:
        chunk = HAMMING_CHUNK
        while chunk > n:
            chunk //= 2
        chunk = max(chunk, 1)
        n_pad = ((n + chunk - 1) // chunk) * chunk
        if n_pad != n:
            codes = jnp.pad(codes, ((0, n_pad - n), (0, 0)))

        def body(c):  # c: (chunk, W)
            x = jax.lax.population_count(c[None, :, :] ^ qcodes[:, None, :])  # (B, chunk, W)
            return jnp.sum(x.astype(jnp.int32), axis=-1)  # (B, chunk)

        acc = jax.lax.map(body, codes.reshape(n_pad // chunk, chunk, w))  # (n/chunk, B, chunk)
        hamming = jnp.moveaxis(acc, 0, 1).reshape(b, n_pad)[:, :n]
    scores = (dim - 2 * hamming).astype(jnp.float32) / dim
    scores = _masked(scores, mask)
    top_s, top_i = full_topk(scores, k)
    return top_s, top_i.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def int8_scan_topk(
    codes: jax.Array,  # (N, D) int8
    queries: jax.Array,  # (B, D) f32 (unquantized)
    scale: jax.Array,  # (D,) f32 per-dim dequant scale s
    offset: jax.Array,  # (D,) f32 per-dim dequant offset o
    mask: Optional[jax.Array],
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Asymmetric int8 scan as an int8 x int8 MXU matmul.

    score(q, c) = q . (c*s + o) = sum_d (q_d s_d) c_d + q.o.  The per-dim
    scale is folded into the query, the folded query is symmetric-quantized to
    int8, and the N x D corpus matmul runs entirely in int8 on the MXU
    (int32 accumulation). Stage-2 fp32 rescoring recovers exact ordering for
    the survivors, so stage-1 quantization noise only affects recall at the
    candidate margin.
    """
    qs = queries * scale[None, :]  # (B, D) fold dequant scale
    qmax = jnp.max(jnp.abs(qs), axis=1, keepdims=True) + 1e-12
    sq = qmax / 127.0  # per-query symmetric scale
    qi = jnp.clip(jnp.round(qs / sq), -127, 127).astype(jnp.int8)
    raw = jax.lax.dot_general(
        qi,
        codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, N) int32
    const = queries @ offset  # (B,)
    scores = raw.astype(jnp.float32) * sq + const[:, None]
    scores = _masked(scores, mask)
    top_s, top_i = full_topk(scores, k)
    return top_s, top_i.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "k_candidates", "stage1"))
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
) -> Tuple[jax.Array, jax.Array]:
    """Fused quantized retrieval: stage-1 scan -> gather -> fp32 rescore -> top-k.

    This is the default query engine, corresponding to the reference's
    `retrieve_by_embedding_quantized` with rescore_multiplier
    (`redis_store.py:757-861`, `quantization.py:185-222`) but fused into a
    single device program: candidates never round-trip to the host.
    """
    if stage1 == "hamming":
        s1, cand = hamming_scan_topk(binary_codes, qbinary, mask, k_candidates)
    elif stage1 == "int8":
        s1, cand = int8_scan_topk(int8_codes, queries, int8_scale, int8_offset, mask, k_candidates)
    else:
        raise ValueError(f"unknown stage1: {stage1}")

    # Gather candidate vectors and rescore. Full fp32 when the corpus keeps
    # fp32 vectors resident; otherwise (fp32-free memory mode) rescore against
    # dequantized int8 — still a large accuracy step up from stage-1 scores.
    # Candidates masked out in stage 1 (-inf) must stay invalid afterwards.
    if corpus.shape[0] > 0:
        cand_vecs = jnp.take(corpus, cand, axis=0).astype(jnp.float32)  # (B, kc, D)
    else:
        cand_i8 = jnp.take(int8_codes, cand, axis=0).astype(jnp.float32)
        cand_vecs = cand_i8 * int8_scale[None, None, :] + int8_offset[None, None, :]
    rescored = jnp.einsum("bd,bkd->bk", queries, cand_vecs)
    rescored = jnp.where(s1 > NEG_INF / 2, rescored, NEG_INF)
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
