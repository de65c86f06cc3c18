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
import numpy as np

# numpy scalar: module-level jnp would init the XLA backend at import,
# breaking jax.distributed.initialize (DCN).
NEG_INF = np.float32(-1e30)


def _rrf_scores(runs, cand, rrf_k, run_weights=None):
    """Per-candidate RRF mass: sum over runs of w_r / (rrf_k + rank)."""
    b, k_total = cand.shape
    score = jnp.zeros((b, k_total), jnp.float32)
    for ri, ids in enumerate(runs):
        kr = ids.shape[1]
        ranks = jnp.arange(1, kr + 1, dtype=jnp.float32)
        weights = 1.0 / (rrf_k + ranks)  # (K_r,)
        match = (cand[:, :, None] == ids[:, None, :]) & (ids[:, None, :] >= 0)
        contrib = jnp.sum(match * weights[None, None, :], axis=-1)
        if run_weights is not None:
            contrib = contrib * run_weights[:, ri][:, None]
        score = score + contrib
    return score


def _dedup_topk(cand, score, k):
    """Keep first occurrence of each row, top-k by score."""
    k_total = cand.shape[1]
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
    score = _rrf_scores(runs, cand, rrf_k)
    return _dedup_topk(cand, score, k)


@partial(jax.jit, static_argnames=("k", "rrf_k"))
def weighted_rrf_fuse(
    runs: Tuple[jax.Array, ...],  # each (B, K_r) int32 doc rows, -1 = pad
    run_weights: jax.Array,       # (B, n_runs) f32, per-query per-run weight
    k: int,
    rrf_k: int = 60,
) -> Tuple[jax.Array, jax.Array]:
    """RRF with per-(query, run) weights: a leg whose score distribution says
    it is uninformative contributes less mass. The reference fuses with equal
    weights only (`agents/fusion.py:79-102`) — which halves hybrid MRR when
    one leg is garbage (a known failure mode this rebuild must beat)."""
    cand = jnp.concatenate(runs, axis=1)
    score = _rrf_scores(runs, cand, rrf_k, run_weights)
    return _dedup_topk(cand, score, k)


@partial(jax.jit, static_argnames=("k",))
def score_fuse(
    runs: Tuple[jax.Array, ...],        # each (B, K_r) int32 rows, -1 pad
    run_scores: Tuple[jax.Array, ...],  # each (B, K_r) f32 leg scores
    run_weights: jax.Array,             # (B, n_runs) f32
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query z-normalized score interpolation over the union of runs.

    Rank-only RRF perturbs a strong leg's correct head whenever the weak leg
    merely disagrees; score interpolation only promotes a candidate the weak
    leg is CONFIDENT about. Measured on the quality harness (round 3): at
    dense = 0.5x bm25 self-retrieval MRR, EVERY rank-disturbing RRF weight
    loses fused MRR (monotone down from w=0) while score fusion at w=0.2-0.3
    breaks even — the safe fusion for mid-quality legs.

    Each run's live scores are z-normalized then shifted so the run's WORST
    live candidate sits at a small positive floor: a candidate a leg
    retrieved always outranks one it did not (absence contributes exactly 0
    -- no negative evidence), a run's internal order is preserved under any
    weights (w=[0,1] reproduces that leg's list exactly), and a confident
    head still towers (z range ~3 vs floor 0.05)."""
    cand = jnp.concatenate(runs, axis=1)  # (B, C)
    total = jnp.zeros(cand.shape, jnp.float32)
    for ri, (ids, s) in enumerate(zip(runs, run_scores)):
        live = ids >= 0
        cnt = jnp.maximum(live.sum(axis=1, keepdims=True), 1)
        mu = jnp.where(live, s, 0.0).sum(axis=1, keepdims=True) / cnt
        var = jnp.where(live, (s - mu) ** 2, 0.0).sum(axis=1, keepdims=True) / cnt
        z = (s - mu) * jax.lax.rsqrt(var + 1e-12)
        zmin = jnp.min(jnp.where(live, z, jnp.inf), axis=1, keepdims=True)
        zmin = jnp.where(jnp.isfinite(zmin), zmin, 0.0)
        z = jnp.where(live, z - zmin + 0.05, 0.0)
        match = (cand[:, :, None] == ids[:, None, :]) & live[:, None, :]
        contrib = jnp.sum(match * z[:, None, :], axis=-1)
        total = total + run_weights[:, ri][:, None] * contrib
    return _dedup_topk(cand, total, k)


def calibrated_leg_weights(leg_mrrs, floor: float = 0.002, gamma: float = 2.0,
                           gate: float = 0.75, tiebreak: float = 0.005):
    """Measured per-leg quality -> RRF weights (host-side; plain python).

    `leg_mrrs` are unsupervised self-retrieval MRRs measured by probing each
    leg with ICT pseudo-queries of sampled corpus docs (target = source doc —
    no labels needed). Two mechanisms:

    * smooth: weights go as mrr**gamma, so comparable legs fuse near-equally
      and a weaker-but-useful leg is subordinated;
    * gate: a leg below `gate` x the best leg's MRR is demoted to `tiebreak`
      x the best weight — under RRF's smallest within-top-10 rank-gap ratio
      ((1/69-1/70)/(1/61) ~ 1.3%), so it can only order docs the good leg
      did not rank at all. Measured three times on the quality harness:
      a leg at <=0.2x the other's MRR net-LOSES fused MRR at any
      rank-disturbing weight; at 0.51x (dense 0.37 vs bm25 0.72 after a
      6k-step train) the smooth mrr^2 weight 0.21 ALSO lost 0.09 fused MRR
      and the full weight sweep was monotone down from w=0 — so the gate
      sits at 0.75: RRF's rank-only perturbation only pays once the legs
      are near parity (see tools/quality_harness.py fusion_weight_sweep).

    The reference has no such mechanism (equal weights always,
    `agents/fusion.py:79-102`) and measurably loses half its hybrid MRR when
    one leg is bad."""
    ws = [max(float(m), 0.0) ** gamma + floor for m in leg_mrrs]
    best_m = max(leg_mrrs)
    best_w = max(ws)
    if best_m > 0.0:
        ws = [tiebreak * best_w if m < gate * best_m else w
              for m, w in zip(leg_mrrs, ws)]
    total = sum(ws)
    return [w / total for w in ws]
