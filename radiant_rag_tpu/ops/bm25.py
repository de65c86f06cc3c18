"""Device BM25 scoring: term-at-a-time scatter-add over gathered postings.

Replaces the reference's hottest CPU loop — `BM25Index.search` iterating every
document per query term with `tokens.count(term)`, O(terms x docs x doclen)
(`storage/bm25_index.py:218-270`) — with an impact-style design: the host
gathers the query terms' posting lists from a CSR inverted index (numpy
slicing, O(total postings)), and the device computes all BM25 contributions
vectorized and scatter-adds them into a dense per-doc score array, then
top-ks. Document lengths live on device; IDF rides along with each posting.

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

NEG_INF = jnp.float32(-1e30)


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
