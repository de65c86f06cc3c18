"""Graph index: KNN graph + batched greedy-beam search on device.

The TPU-native answer to the reference's HNSW backends (RediSearch
`redis_store.py:260-276` M=16/efC=200/efR=100, pgvector
`pgvector_store.py:265-320`). HNSW is a pointer-chasing structure built for
CPUs; on TPU the same capability maps to (SURVEY.md §7.4.1):

  build   an EXACT k-nearest-neighbor graph from tiled corpus x corpus
          matmuls on the MXU (O(N^2 D) FLOPs — cheap in wall-clock on a
          systolic array; HNSW's incremental build exists to avoid this on
          CPUs and delivers only an approximate graph) with fixed out-degree
          R, stored as one (N, R) int32 adjacency array. Random long-range
          edges restore navigability for greedy search (KNN graphs alone
          have poor global connectivity).
  search  batched greedy beam search, fully vectorized: each step gathers
          the beam's neighborhoods, scores them against the queries in one
          einsum, deduplicates by pairwise compare (beam widths are small),
          and keeps the top-ef. Fixed step count -> static shapes, one jit.

At <=1M rows the flat quantized scan usually wins (SURVEY.md §7.4.1 "at 1M x
48B the Hamming scan may already win — measure both"); the graph engine is
for corpora where N x D reads per query stop fitting the latency budget.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radiant_rag_tpu.ops.similarity import NEG_INF, full_topk

logger = logging.getLogger(__name__)


def build_knn_graph(
    vecs: np.ndarray,  # (N, D) L2-normalized
    degree: int = 16,
    n_long_edges: int = 4,
    block: int = 4096,
    seed: int = 0,
    valid: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Exact KNN graph via tiled device matmuls; returns (N, R+L) int32.

    Each row's neighbors are its `degree` nearest by cosine plus
    `n_long_edges` random long-range links (rewiring for navigability)."""
    n, d = vecs.shape
    vdev = jnp.asarray(vecs)
    mask = None if valid is None else jnp.asarray(valid)

    @partial(jax.jit, static_argnames=("k",))
    def block_topk(qblock, row_offset, k):
        scores = jax.lax.dot_general(
            qblock, vdev, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # exclude self-edges
        cols = jnp.arange(n)[None, :]
        rows = row_offset + jnp.arange(qblock.shape[0])[:, None]
        scores = jnp.where(cols == rows, NEG_INF, scores)
        if mask is not None:
            scores = jnp.where(mask[None, :], scores, NEG_INF)
        return full_topk(scores, k)

    out = np.zeros((n, degree + n_long_edges), np.int32)
    # dispatch ALL blocks asynchronously, then fetch: the per-call fixed
    # dispatch+fetch latency (27 ms-class through remote-device tunnels)
    # overlaps with the next block's matmul instead of serializing after it
    pending = []
    for start in range(0, n, block):
        end = min(start + block, n)
        qb = vdev[start:end]
        if end - start < block:  # pad to static shape
            qb = jnp.pad(qb, ((0, block - (end - start)), (0, 0)))
        _, idx = block_topk(qb, jnp.asarray(start), degree)
        pending.append((start, end, idx))
    for start, end, idx in pending:
        out[start:end, :degree] = np.asarray(idx)[: end - start]
    rng = np.random.default_rng(seed)
    if n_long_edges > 0:
        out[:, degree:] = rng.integers(0, n, (n, n_long_edges), dtype=np.int32)
    return out


@partial(jax.jit, static_argnames=("k", "ef", "steps"))
def graph_search(
    vecs: jax.Array,  # (N, D) f32
    neighbors: jax.Array,  # (N, R) int32
    entry_points: jax.Array,  # (E,) int32
    queries: jax.Array,  # (B, D) f32
    mask: Optional[jax.Array],  # (N,) bool or None
    k: int,
    ef: int = 64,
    steps: int = 6,
) -> Tuple[jax.Array, jax.Array]:
    """Batched greedy beam search; returns (scores (B,k), rows (B,k))."""
    b = queries.shape[0]
    r = neighbors.shape[1]
    e = entry_points.shape[0]

    def score_ids(ids):  # ids (B, M) -> (B, M) cosine, invalid = -inf
        gathered = jnp.take(vecs, jnp.maximum(ids, 0), axis=0)  # (B, M, D)
        s = jnp.einsum("bd,bmd->bm", queries, gathered)
        s = jnp.where(ids >= 0, s, NEG_INF)
        if mask is not None:
            s = jnp.where(jnp.take(mask, jnp.maximum(ids, 0)), s, NEG_INF)
        return s

    def dedup_mask(ids):  # keep first occurrence of each id
        m = ids.shape[1]
        eq = ids[:, :, None] == ids[:, None, :]
        lower = jnp.tril(jnp.ones((m, m), bool), k=-1)[None]
        return ~jnp.any(eq & lower, axis=-1)

    beam_ids = jnp.broadcast_to(entry_points[None, :], (b, e))
    beam_scores = score_ids(beam_ids)

    def body(carry, _):
        beam_ids, beam_scores = carry
        nbr = jnp.take(neighbors, jnp.maximum(beam_ids, 0), axis=0)  # (B, ef', R)
        nbr = jnp.where(beam_ids[:, :, None] >= 0, nbr, -1).reshape(b, -1)
        cand_ids = jnp.concatenate([beam_ids, nbr], axis=1)
        cand_scores = jnp.concatenate([beam_scores, score_ids(nbr)], axis=1)
        keep = dedup_mask(cand_ids)
        cand_scores = jnp.where(keep, cand_scores, NEG_INF)
        top_s, sel = jax.lax.top_k(cand_scores, ef)
        top_ids = jnp.take_along_axis(cand_ids, sel, axis=1)
        top_ids = jnp.where(top_s > NEG_INF / 2, top_ids, -1)
        return (top_ids, top_s), None

    # first expansion widens the beam from E entries to ef
    (beam_ids, beam_scores), _ = body((beam_ids, beam_scores), None)
    (beam_ids, beam_scores), _ = jax.lax.scan(
        body, (beam_ids, beam_scores), None, length=steps - 1)

    top_s, sel = jax.lax.top_k(beam_scores, k)
    top_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
    top_ids = jnp.where(top_s > NEG_INF / 2, top_ids, -1)
    return top_s, top_ids.astype(jnp.int32)


class GraphIndex:
    """Graph engine over an existing row space (wraps the flat engine's
    vectors). ef_runtime/ef_construction map onto beam width/build degree
    (reference `config.py:266-272`)."""

    def __init__(self, degree: int = 16, n_long_edges: int = 4,
                 n_entry_points: int = 16, steps: int = 6, seed: int = 0) -> None:
        self.degree = degree
        self.n_long_edges = n_long_edges
        self.n_entry_points = n_entry_points
        self.steps = steps
        self.seed = seed
        self.neighbors: Optional[jnp.ndarray] = None
        self.entry_points: Optional[jnp.ndarray] = None
        self.built_rows = 0

    def build(self, vecs: np.ndarray, valid: Optional[np.ndarray] = None) -> None:
        n = vecs.shape[0]
        adj = build_knn_graph(vecs, self.degree, self.n_long_edges,
                              seed=self.seed, valid=valid)
        rng = np.random.default_rng(self.seed + 1)
        if valid is not None and valid.any():
            pool = np.nonzero(valid)[0]
        else:
            pool = np.arange(n)
        entries = rng.choice(pool, size=min(self.n_entry_points, len(pool)),
                             replace=False).astype(np.int32)
        self.neighbors = jnp.asarray(adj)
        self.entry_points = jnp.asarray(entries)
        self.built_rows = n

    def search(self, vecs_dev: jax.Array, queries: np.ndarray, k: int,
               ef: int = 64, mask: Optional[jax.Array] = None,
               ) -> Tuple[np.ndarray, np.ndarray]:
        if self.neighbors is None:
            raise RuntimeError("graph not built")
        qdev = jnp.asarray(np.asarray(queries, np.float32))
        ef = max(ef, k)
        s, i = graph_search(vecs_dev, self.neighbors, self.entry_points, qdev,
                            mask, k, ef=ef, steps=self.steps)
        return np.asarray(s), np.asarray(i).astype(np.int64)
