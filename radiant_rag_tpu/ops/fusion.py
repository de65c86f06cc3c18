"""On-device reciprocal-rank fusion (RRF) + top-k.

Replaces the reference's python-dict RRF (`agents/fusion.py:79-102`:
score[doc] += 1/(rrf_k + rank), rrf_k=60) with a vectorized device program so
hybrid fusion happens in the same jit as the dense and sparse scans.

Doc identity here is the integer row index in the index engine; -1 marks
padding. Candidate lists are small (top_k per run, 10-100), so the O(K^2)
pairwise-equality dedup is trivial on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("k", "rrf_k"))
def rrf_fuse(
    runs: Tuple[jax.Array, ...],  # each (B, K_r) int32 doc rows, -1 = pad
    k: int,
    rrf_k: int = 60,
) -> Tuple[jax.Array, jax.Array]:
    """Fuse ranked runs with RRF; returns (scores (B,k), rows (B,k), -1 pad).

    score(doc) = sum over runs of 1 / (rrf_k + rank) with rank starting at 1,
    matching the reference's formula (`agents/fusion.py:79-102`).
    """
    cand = jnp.concatenate(runs, axis=1)  # (B, K_total)
    b, k_total = cand.shape

    # RRF contributions: for each candidate slot, sum 1/(rrf_k + rank) over
    # every run position holding the same doc row.
    score = jnp.zeros((b, k_total), jnp.float32)
    for ids in runs:
        kr = ids.shape[1]
        ranks = jnp.arange(1, kr + 1, dtype=jnp.float32)
        weights = 1.0 / (rrf_k + ranks)  # (K_r,)
        match = (cand[:, :, None] == ids[:, None, :]) & (ids[:, None, :] >= 0)
        score = score + jnp.sum(match * weights[None, None, :], axis=-1)

    # Keep only first occurrence of each doc row (dedup across runs).
    eq_prior = cand[:, :, None] == cand[:, None, :]  # (B, K, K)
    idx = jnp.arange(k_total)
    lower = idx[None, :, None] > idx[None, None, :]  # j < i
    is_dup = jnp.any(eq_prior & lower, axis=-1)
    valid = (cand >= 0) & ~is_dup

    score = jnp.where(valid, score, NEG_INF)
    top_s, top_i = jax.lax.top_k(score, k)
    top_rows = jnp.take_along_axis(cand, top_i, axis=1)
    top_rows = jnp.where(top_s > NEG_INF / 2, top_rows, -1)
    return top_s, top_rows.astype(jnp.int32)
