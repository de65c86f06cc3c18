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

Incremental insertion (streaming-graph style, the HNSW-insert analog —
reference stores insert incrementally via RediSearch/pgvector HNSW):
  out-edges  each new node gets EXACT top-`degree` neighbors from one device
             matmul over the current corpus (what HNSW approximates with its
             beam descent) plus random long edges.
  back-edges new nodes become reachable by replacing the WEAKEST current
             out-edge of each of their nearest existing nodes (edge strengths
             recomputed on device; replacement merge vectorized on host).
Old nodes' edges are otherwise untouched, so graph quality can drift under
adversarial churn; `stale_fraction` reports incremental growth since the last
full build for rebuild policies.
"""

from __future__ import annotations

import logging
import time as _time
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


@partial(jax.jit, static_argnames=("k",))
def _descent_block(
    vdev: jax.Array,  # (N, D) corpus
    mask: jax.Array,  # (N,) bool live rows
    adj_dev: jax.Array,  # (N, R) int32 current adjacency (device-resident)
    qblk: jax.Array,  # (b, D) the block's own vectors
    qrows: jax.Array,  # (b,) int32 the block's own rows
    extra_ids: jax.Array,  # (b, E) int32 reverse-sample + random probes
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """One NN-descent refinement step for a node block. Forward and
    two-hop candidates are gathered from the DEVICE-resident adjacency
    (the per-iteration upload is one (N, R) array instead of a (b, R^2)
    candidate table per block); only the small reverse/random probe table
    ships per block."""
    r = adj_dev.shape[1]
    fwd = jnp.take(adj_dev, jnp.maximum(qrows, 0), axis=0)  # (b, R)
    fwd2 = jnp.take(adj_dev, jnp.maximum(fwd, 0), axis=0).reshape(
        fwd.shape[0], r * r)
    fwd2 = jnp.where(jnp.repeat(fwd >= 0, r, axis=1), fwd2, -1)
    cand_ids = jnp.concatenate([fwd, fwd2, extra_ids], axis=1)
    return _refine_block(vdev, mask, qblk, qrows, cand_ids, k)


def _refine_block(
    vdev: jax.Array,  # (N, D) corpus
    mask: jax.Array,  # (N,) bool live rows
    qblk: jax.Array,  # (b, D) the block's own vectors
    qrows: jax.Array,  # (b,) int32 the block's own rows
    cand_ids: jax.Array,  # (b, C) int32 candidate neighbor ids (-1 pad, dups ok)
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Score all candidates (bf16 gather+einsum — near-tie order is
    irrelevant to graph quality), drop self/dead/duplicate ids, keep the
    top-k as the new out-edges."""
    b, c = cand_ids.shape
    safe = jnp.maximum(cand_ids, 0)
    g = jnp.take(vdev, safe, axis=0).astype(jnp.bfloat16)  # (b, C, D)
    s = jnp.einsum("bd,bcd->bc", qblk.astype(jnp.bfloat16), g,
                   preferred_element_type=jnp.float32)
    bad = (cand_ids < 0) | (cand_ids == qrows[:, None]) | ~jnp.take(mask, safe)
    # duplicate suppression: sort ids, flag equal-to-previous, unsort
    iota = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None], (b, c))
    sid, perm = jax.lax.sort_key_val(cand_ids, iota, dimension=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((b, 1), bool), sid[:, 1:] == sid[:, :-1]], axis=1)
    dup = jnp.zeros((b, c), bool).at[
        jnp.arange(b, dtype=jnp.int32)[:, None], perm].set(dup_sorted)
    s = jnp.where(bad | dup, NEG_INF, s)
    top_s, sel = jax.lax.top_k(s, k)
    ids = jnp.take_along_axis(cand_ids, sel, axis=1)
    ids = jnp.where(top_s > NEG_INF / 2, ids, -1)
    return top_s, ids


_refine_block_jit = partial(jax.jit, static_argnames=("k",))(_refine_block)


@jax.jit
def _nearest_sample_block(sample_vecs: jax.Array, qblk: jax.Array) -> jax.Array:
    """Index (into the sample) of each block row's nearest sample vector."""
    s = jax.lax.dot_general(
        qblk.astype(jnp.bfloat16), sample_vecs.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=1)


def nn_descent_graph(
    vecs: np.ndarray,  # (N, D) L2-normalized
    degree: int = 16,
    n_long_edges: int = 4,
    iters: int = 40,
    block: int = 4096,
    seed: int = 0,
    valid: Optional[np.ndarray] = None,
    n_reverse: int = 16,
    n_random: int = 8,
    converge_frac: float = 0.001,
    two_level: bool = False,
    polish: bool = True,
) -> np.ndarray:
    """Approximate KNN graph by NN-descent; returns (N, R+L) int32.

    The exact tiled build (`build_knn_graph`) is O(N^2 D) — fine to ~200k
    rows, hours at 10M. NN-descent converges to a near-exact KNN graph in
    O(N * C * D * iters) where C = R + R^2 + reverse + random candidates per
    node: each round, every node scores its neighbors' neighbors (plus a
    reverse-edge sample and random probes) in one bf16 gather+einsum device
    program per block, keeping the top-R. Empirically >=90% edge agreement
    with the exact graph in <=8 rounds on clustered corpora, and the searched
    recall matches (tests/test_graph.py).

    `iters` is a CEILING, not a schedule: descent stops when a round changes
    <= converge_frac of all edges (round-over-round criterion — 200k
    converges in ~10 rounds while 1M keeps discovering past 20, so hand-set
    per-scale round counts under-converged large corpora). Per-round change
    counts are logged for convergence studies.

    Candidate generation and the reverse-edge sample run vectorized on host
    (numpy) per round; all device blocks are dispatched asynchronously, so
    per-round wall time is max(device score time, host assembly).

    n_reverse/n_random auto-scale with corpus size: the fixed small budget
    that reaches 0.97 edge agreement at 200k rows saturates at 0.87 at 1M —
    each round explores a constant number of candidates out of a growing
    space, so the marginal discovery rate decays with N. Callers passing
    explicit values keep them.

    two_level=True (experimental): converge a <=131k-row subsample graph
    first (where this recipe reaches ~0.97 agreement), then initialize
    every node with the adjacency of its NEAREST subsample member before
    the full-corpus rounds. Unlike seeding edges at the sample rows
    themselves (measured hub collapse, BENCH_NOTES init study), inherited
    targets are the sample node's own neighbors — in-degree concentration
    is only ~N/S per target, about the random-init scale."""
    n, d = vecs.shape
    r = degree
    # ~2x budget at 1M, ~4x at 10M (capped: per-round cost grows with C)
    n_reverse = max(n_reverse, min(64, n // 16384))
    n_random = max(n_random, min(32, n // 32768))
    # bf16 residency for big corpora: _refine_block scores in bf16 either
    # way (the cast just moves before upload), and fp32 at 10M x 384 is
    # 15.4 GB — it would not fit next to the descent transients in 16 GB HBM
    if vecs.nbytes > (4 << 30):
        vdev = jnp.asarray(vecs, jnp.bfloat16)
    else:
        vdev = jnp.asarray(vecs)
    live = np.ones(n, bool) if valid is None else np.asarray(valid, bool).copy()
    pool = np.nonzero(live)[0]
    if len(pool) == 0:
        return np.full((n, r + n_long_edges), -1, np.int32)
    mask_dev = jnp.asarray(live)
    rng = np.random.default_rng(seed)

    # UNIFORM-RANDOM init — kept as the default after measuring two
    # "smarter" inits at 1M rows that both LOST to it (agreement after
    # convergence: random 0.87, all-edges-seeded-from-a-4096-sample 0.55,
    # half-seeded 0.74). Sample-seeded edges concentrate in-degree on the
    # sample rows; those hubs dominate reverse sampling and two-hop
    # expansion, so the descent explores around the hubs instead of each
    # node's own region. Random init has no hubs: every node's candidates
    # diversify independently. two_level (docstring) inherits CONVERGED
    # subsample adjacency instead, which avoids the hub concentration.
    if two_level and len(pool) > 1 << 18:
        s1 = min(1 << 17, len(pool))
        sub = rng.choice(pool, size=s1, replace=False).astype(np.int32)
        sub_vecs = np.ascontiguousarray(np.asarray(vecs)[sub])
        sub_adj = nn_descent_graph(
            sub_vecs, degree=r, n_long_edges=0, iters=iters, block=block,
            seed=seed + 7)[:, :r]
        # local subsample ids -> corpus rows (-1 stays -1)
        sub_adj = np.where(sub_adj >= 0, sub[np.maximum(sub_adj, 0)], -1)
        sub_vecs_dev = jnp.take(vdev, jnp.asarray(sub), axis=0)
        nearest = np.empty(n, np.int64)
        pend = []
        for b0 in range(0, n, block):
            e0 = min(b0 + block, n)
            qb = vdev[b0:e0]
            if e0 - b0 < block:
                qb = jnp.pad(qb, ((0, block - (e0 - b0)), (0, 0)))
            pend.append((b0, e0, _nearest_sample_block(sub_vecs_dev, qb)))
        for b0, e0, idx in pend:
            nearest[b0:e0] = np.asarray(idx)[: e0 - b0]
        adj = sub_adj[nearest]
        dead = adj < 0
        if dead.any():
            adj[dead] = rng.choice(pool, size=int(dead.sum()), replace=True)
        adj = adj.astype(np.int32)
    else:
        adj = rng.choice(pool, size=(n, r), replace=True).astype(np.int32)
    rev = np.full((n, n_reverse), -1, np.int32)
    for it in range(iters):
        # reverse-edge sample: for each edge i->j, j sees i as a candidate
        # (random-slot scatter; collisions overwrite = uniform-ish sample)
        rev.fill(-1)
        src = np.repeat(np.arange(n, dtype=np.int32), r)
        dst = adj.reshape(-1)
        ok = dst >= 0
        slots = rng.integers(0, n_reverse, ok.sum())
        rev[dst[ok], slots] = src[ok]

        changed = 0
        pending = []
        adj_dev = jnp.asarray(adj)  # ONE (N, R) upload per round
        for s0 in range(0, n, block):
            e0 = min(s0 + block, n)
            b = e0 - s0
            rnd = rng.choice(pool, size=(b, n_random), replace=True).astype(np.int32)
            extra = np.concatenate([rev[s0:e0], rnd], axis=1)
            qb = vdev[s0:e0]
            qrows = np.arange(s0, s0 + block, dtype=np.int32)
            if b < block:
                qb = jnp.pad(qb, ((0, block - b), (0, 0)))
                extra = np.concatenate(
                    [extra, np.full((block - b, extra.shape[1]), -1, np.int32)])
            _, ids = _descent_block(vdev, mask_dev, adj_dev, qb,
                                    jnp.asarray(qrows), jnp.asarray(extra), r)
            pending.append((s0, e0, ids))
        for s0, e0, ids in pending:
            new = np.asarray(ids)[: e0 - s0]
            changed += int((new != adj[s0:e0]).sum())
            adj[s0:e0] = new
        logger.info("nn-descent round %d: %d edge changes (%.3f%% of %d)",
                    it + 1, changed, 100.0 * changed / max(n * r, 1), n * r)
        if changed <= converge_frac * n * r:
            logger.info("nn-descent converged after %d rounds (%d changes)",
                        it + 1, changed)
            break

    if polish:
        t_p = _time.time()
        adj = _cluster_polish(vdev, mask_dev, adj, pool, rng, block=block // 2)
        logger.info("cluster polish: %.1fs", _time.time() - t_p)

    out = np.full((n, r + n_long_edges), -1, np.int32)
    out[:, :r] = adj
    if n_long_edges > 0:
        out[:, r:] = rng.choice(pool, size=(n, n_long_edges),
                                replace=True).astype(np.int32)
    return out


@partial(jax.jit, static_argnames=("n_probe",))
def _topk_centroids(cent_vecs: jax.Array, qblk: jax.Array, n_probe: int) -> jax.Array:
    """ids of each row's n_probe nearest centroids (bf16 matmul)."""
    s = jax.lax.dot_general(
        qblk.astype(jnp.bfloat16), cent_vecs.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    _, ids = jax.lax.top_k(s, n_probe)
    return ids.astype(jnp.int32)


def _cluster_polish(vdev, mask_dev, adj: np.ndarray, pool: np.ndarray,
                    rng: np.random.Generator, block: int = 2048,
                    n_centroids: int = 4096, n_probe: int = 2) -> np.ndarray:
    """Exact within-cluster refinement after NN-descent converges.

    The 1M edge study (tools/graph_edge_study.py, BENCH_NOTES r3) showed the
    descent plateau is NOT tail tie-noise: misses spread across ALL true
    ranks (6.7% of rank-1 neighbors), 94% have real positive margins
    (median cosine gap 0.005), 100% are intra-cluster, and missed targets
    have normal in-degree — i.e. two-hop exploration saturates before
    resolving fine ranking among ~1000 near-equidistant cluster members.
    The structural fix: partition rows by nearest sample centroid and score
    every node EXACTLY against its n_probe nearest partitions' members
    (union'd with its descent edges, top-R kept). One _refine_block pass at
    candidate width R + n_probe*cap — cost of ~2-3 descent rounds, exact
    within the probed partitions."""
    n, r = adj.shape
    # partitions must be much larger than the degree for the exact pass to
    # contain each node's true neighbors: target ~64 members per centroid
    take = max(4, min(n_centroids, len(pool) // 64 or 1))
    # member cap bounds the gather transient; 3x the mean partition size
    # covers skew (overflow rows keep their descent edges)
    cap = min(512, max(64, 3 * n // take))
    cent_rows = rng.choice(pool, size=take, replace=False).astype(np.int32)
    cent_vecs = jnp.take(vdev, jnp.asarray(cent_rows), axis=0)

    probes = np.empty((n, n_probe), np.int32)
    ablk = 8192
    pend = []
    for s0 in range(0, n, ablk):
        e0 = min(s0 + ablk, n)
        qb = vdev[s0:e0]
        if e0 - s0 < ablk:
            qb = jnp.pad(qb, ((0, ablk - (e0 - s0)), (0, 0)))
        pend.append((s0, e0, _topk_centroids(cent_vecs, qb, n_probe)))
    for s0, e0, ids in pend:
        probes[s0:e0] = np.asarray(ids)[: e0 - s0]

    # bucket rows by top-1 centroid (host, vectorized fill)
    member_table = np.full((take, cap), -1, np.int32)
    top1 = probes[:, 0]
    order = np.argsort(top1, kind="stable").astype(np.int32)
    sorted_c = top1[order]
    starts = np.searchsorted(sorted_c, np.arange(take))
    ends = np.searchsorted(sorted_c, np.arange(take), side="right")
    for c in range(take):
        members = order[starts[c]: ends[c]][:cap]
        member_table[c, : len(members)] = members

    # candidates read only the PRE-polish adjacency, so all blocks dispatch
    # asynchronously and fetch at the end (per-call latency overlaps compute)
    pend2 = []
    for s0 in range(0, n, block):
        e0 = min(s0 + block, n)
        b = e0 - s0
        extra = member_table[probes[s0:e0]].reshape(b, n_probe * cap)
        qb = vdev[s0:e0]
        qrows = np.arange(s0, s0 + block, dtype=np.int32)
        cand = np.concatenate([adj[s0:e0], extra], axis=1)
        if b < block:
            qb = jnp.pad(qb, ((0, block - b), (0, 0)))
            cand = np.concatenate(
                [cand, np.full((block - b, cand.shape[1]), -1, np.int32)])
        _, ids = _refine_block_jit(vdev, mask_dev, qb, jnp.asarray(qrows),
                                   jnp.asarray(cand), k=r)
        pend2.append((s0, e0, ids))
    for s0, e0, ids in pend2:
        adj[s0:e0] = np.asarray(ids)[: e0 - s0]
    return adj


@partial(jax.jit, static_argnames=("k",))
def _knn_block(
    vdev: jax.Array,  # (N, D) corpus (any float dtype)
    mask: jax.Array,  # (N,) bool — valid AND row < total
    qblock: jax.Array,  # (Q, D) new vectors (padded block)
    qrows: jax.Array,  # (Q,) int32 the new vectors' own rows (self-exclusion)
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of a block of new vectors against the live corpus."""
    scores = jax.lax.dot_general(
        qblock.astype(jnp.float32), vdev.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    cols = jnp.arange(vdev.shape[0])[None, :]
    scores = jnp.where(cols == qrows[:, None], NEG_INF, scores)
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    return full_topk(scores, k)


@jax.jit
def _edge_scores(
    vdev: jax.Array,  # (N, D)
    mask: jax.Array,  # (N,) bool live-row mask
    e_rows: jax.Array,  # (E,) int32 existing rows whose edges we re-score
    adj: jax.Array,  # (E, R) int32 their current out-edges (-1 pad)
) -> jax.Array:
    """Cosine strength of each current edge; dead/invalid edges score -inf
    (so weakest-edge replacement evicts them first)."""
    src = jnp.take(vdev, jnp.maximum(e_rows, 0), axis=0).astype(jnp.float32)
    dst = jnp.take(vdev, jnp.maximum(adj, 0), axis=0).astype(jnp.float32)
    s = jnp.einsum("ed,erd->er", src, dst)
    live = (adj >= 0) & jnp.take(mask, jnp.maximum(adj, 0))
    return jnp.where(live, s, NEG_INF)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_adj(neighbors: jax.Array, rows: jax.Array, values: jax.Array) -> jax.Array:
    return neighbors.at[rows].set(values, mode="drop")


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
    entry_sample_rows: Optional[jax.Array] = None,  # (E0,) int32
    entry_sample_vecs: Optional[jax.Array] = None,  # (E0, D)
) -> Tuple[jax.Array, jax.Array]:
    """Batched greedy beam search; returns (scores (B,k), rows (B,k)).

    With an entry SAMPLE (rows + their vectors, device-resident), each query
    first scores the whole sample in one small matmul and seeds its beam with
    the per-query top-E rows — a coarse-quantizer entry stage. Without it,
    all queries share E fixed random entries, and greedy pruning strands the
    beam in whatever basin those entries happen to sit in: measured at 200k
    rows / 0.967-exact graph, shared-random entries plateau at recall 0.73
    regardless of ef/steps; per-query sampled entries fix exactly that
    (HNSW's hierarchy serves the same coarse-to-fine role on CPUs)."""
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

    if entry_sample_vecs is not None:
        es = jax.lax.dot_general(
            queries, entry_sample_vecs.astype(queries.dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        e = min(e, int(entry_sample_rows.shape[0]))  # sample may be small
        _, sel0 = jax.lax.top_k(es, e)  # per-query best sample rows
        beam_ids = jnp.take(entry_sample_rows, sel0)  # (B, E)
    else:
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
                 n_entry_points: int = 16, steps: int = 6, seed: int = 0,
                 entry_sample_size: int = 4096) -> None:
        self.degree = degree
        self.n_long_edges = n_long_edges
        self.n_entry_points = n_entry_points
        self.steps = steps
        self.seed = seed
        self.entry_sample_size = entry_sample_size
        self.neighbors: Optional[jnp.ndarray] = None
        self.entry_points: Optional[jnp.ndarray] = None
        # coarse-entry sample: per-query beam seeding (see graph_search)
        self.entry_sample_rows: Optional[jnp.ndarray] = None
        self.entry_sample_vecs: Optional[jnp.ndarray] = None
        self.built_rows = 0

    def _refresh_entry_sample(self, vecs_dev, live_pool: np.ndarray,
                              rng: np.random.Generator) -> None:
        """(Re)draw the coarse-entry sample from live rows; vectors are
        gathered device-side (no host copy of the corpus)."""
        if len(live_pool) == 0:
            self.entry_sample_rows = None
            self.entry_sample_vecs = None
            return
        take = min(self.entry_sample_size, len(live_pool))
        rows = rng.choice(live_pool, size=take, replace=False).astype(np.int32)
        rows_dev = jnp.asarray(rows)
        self.entry_sample_rows = rows_dev
        if isinstance(vecs_dev, jax.Array):
            self.entry_sample_vecs = jnp.take(vecs_dev, rows_dev, axis=0)
        else:  # host array: gather on host, upload only the sample
            self.entry_sample_vecs = jnp.asarray(np.asarray(vecs_dev)[rows])

    # above this many rows, build() switches from the exact O(N^2) tiled
    # KNN build to NN-descent (near-exact, O(N * C * iters))
    EXACT_BUILD_MAX_ROWS = 200_000

    def build(self, vecs: np.ndarray, valid: Optional[np.ndarray] = None,
              method: str = "auto") -> None:
        n = vecs.shape[0]
        if method == "auto":
            method = "exact" if n <= self.EXACT_BUILD_MAX_ROWS else "nn_descent"
        if method == "nn_descent":
            adj = nn_descent_graph(vecs, self.degree, self.n_long_edges,
                                   seed=self.seed, valid=valid)
        else:
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
        self._refresh_entry_sample(vecs, pool, rng)
        self.built_rows = n
        self._full_built_rows = n  # rows covered by the last FULL build

    @property
    def stale_fraction(self) -> float:
        """Fraction of rows inserted incrementally since the last full build
        (rebuild policy input: edges of pre-existing nodes are only patched,
        not re-derived, by `add`)."""
        if self.built_rows == 0:
            return 0.0
        full = getattr(self, "_full_built_rows", self.built_rows)
        return (self.built_rows - full) / self.built_rows

    def _ensure_adj_capacity(self, need: int) -> None:
        have = 0 if self.neighbors is None else int(self.neighbors.shape[0])
        if need <= have:
            return
        new_cap = max(have, 256)
        while new_cap < need:
            new_cap *= 2
        host = np.full((new_cap, self.degree + self.n_long_edges), -1, np.int32)
        if self.neighbors is not None:
            host[:have] = np.asarray(self.neighbors)
        self.neighbors = jnp.asarray(host)

    def add(self, vecs_dev, start_row: int, n_new: int,
            valid: Optional[np.ndarray] = None, block: int = 4096) -> None:
        """Incrementally insert rows [start_row, start_row + n_new).

        vecs_dev: (>= start_row + n_new, D) row-aligned vectors (the engine's
        resident `vecs` buffer works as-is; padded tail rows are masked).
        Out-edges are EXACT top-`degree` over the live corpus (one MXU matmul
        per block — the quality HNSW's efC beam approximates); back-edges make
        the new nodes reachable by evicting the weakest current KNN edge of
        each new node's nearest neighbors. Long-edge slots are preserved."""
        if n_new <= 0:
            return
        if self.built_rows == 0:
            raise RuntimeError("add() requires a built graph (call build first)")
        total = start_row + n_new
        deg, nlong = self.degree, self.n_long_edges
        vdev = vecs_dev if isinstance(vecs_dev, jax.Array) else jnp.asarray(
            np.asarray(vecs_dev, np.float32))
        n_rows = int(vdev.shape[0])
        live = np.zeros((n_rows,), bool)
        if valid is not None:
            v = np.asarray(valid)[:total]
            live[: v.shape[0]] = v
        else:
            live[:total] = True
        live[total:] = False
        mask_dev = jnp.asarray(live)
        self._ensure_adj_capacity(total)

        # -- out-edges: exact KNN of each new row over the live corpus ------
        pending = []
        for s in range(start_row, total, block):
            e = min(s + block, total)
            qb = vdev[s:e].astype(jnp.float32)
            qrows = np.arange(s, s + block, dtype=np.int32)
            if e - s < block:
                qb = jnp.pad(qb, ((0, block - (e - s)), (0, 0)))
            top_s, top_i = _knn_block(vdev, mask_dev, qb,
                                      jnp.asarray(qrows), deg)
            pending.append((s, e, top_s, top_i))
        new_rows = np.arange(start_row, total, dtype=np.int32)
        nbrs = np.zeros((n_new, deg), np.int32)
        nscr = np.zeros((n_new, deg), np.float32)
        for s, e, top_s, top_i in pending:
            nbrs[s - start_row : e - start_row] = np.asarray(top_i)[: e - s]
            nscr[s - start_row : e - start_row] = np.asarray(top_s)[: e - s]
        dead = nscr <= NEG_INF / 2  # fewer live rows than degree
        nbrs[dead] = -1
        rng = np.random.default_rng(self.seed + start_row)
        adj_new = np.full((n_new, deg + nlong), -1, np.int32)
        adj_new[:, :deg] = nbrs
        if nlong > 0:
            adj_new[:, deg:] = rng.integers(0, total, (n_new, nlong),
                                            dtype=np.int32)
        self.neighbors = _scatter_adj(self.neighbors, jnp.asarray(new_rows),
                                      jnp.asarray(adj_new))

        # -- back-edges: weakest-KNN-edge replacement on the targets --------
        e_flat = nbrs.reshape(-1)
        v_flat = np.repeat(new_rows, deg)
        s_flat = nscr.reshape(-1)
        keep = e_flat >= 0
        e_flat, v_flat, s_flat = e_flat[keep], v_flat[keep], s_flat[keep]
        if e_flat.size:
            order = np.argsort(e_flat, kind="stable")
            e_s, v_s, s_s = e_flat[order], v_flat[order], s_flat[order]
            uniq, starts, counts = np.unique(e_s, return_index=True,
                                             return_counts=True)
            cmax = int(counts.max())
            cand_ids = np.full((len(uniq), cmax), -1, np.int32)
            cand_scr = np.full((len(uniq), cmax), np.float32(NEG_INF))
            cols = np.arange(len(e_s)) - starts.repeat(counts)
            rowi = np.arange(len(uniq)).repeat(counts)
            cand_ids[rowi, cols] = v_s
            cand_scr[rowi, cols] = s_s
            # fetch ONLY the target rows' adjacency (a full (N, R) d2h is
            # ~800 MB at 10M rows — the scale this engine exists for)
            cur_rows = np.array(jnp.take(self.neighbors, jnp.asarray(uniq),
                                         axis=0))  # writable host copy
            cur_adj = cur_rows[:, :deg]
            # drop candidates already present as edges (two new nodes that
            # are mutual nearest neighbors would otherwise occupy two slots)
            for cs in range(0, len(uniq), 65536):
                ce = min(cs + 65536, len(uniq))
                dup = (cand_ids[cs:ce, :, None] == cur_adj[cs:ce, None, :]).any(-1)
                cand_scr[cs:ce][dup] = np.float32(NEG_INF)
                cand_ids[cs:ce][dup] = -1
            cur_scr = np.empty((len(uniq), deg), np.float32)
            for s in range(0, len(uniq), block):
                e = min(s + block, len(uniq))
                eu = np.zeros((block,), np.int32)
                ea = np.full((block, deg), -1, np.int32)
                eu[: e - s] = uniq[s:e]
                ea[: e - s] = cur_adj[s:e]
                cs = _edge_scores(vdev, mask_dev, jnp.asarray(eu),
                                  jnp.asarray(ea))
                cur_scr[s:e] = np.asarray(cs)[: e - s]
            merged_ids = np.concatenate([cur_adj, cand_ids], axis=1)
            merged_scr = np.concatenate([cur_scr, cand_scr], axis=1)
            sel = np.argsort(-merged_scr, axis=1, kind="stable")[:, :deg]
            new_knn = np.take_along_axis(merged_ids, sel, axis=1)
            new_knn_scr = np.take_along_axis(merged_scr, sel, axis=1)
            new_knn[new_knn_scr <= NEG_INF / 2] = -1
            updated = cur_rows
            updated[:, :deg] = new_knn
            self.neighbors = _scatter_adj(self.neighbors, jnp.asarray(uniq),
                                          jnp.asarray(updated))

        self.built_rows = total
        # refresh entry points + coarse-entry sample so new regions are
        # directly enterable
        pool = np.nonzero(live[:total])[0]
        if len(pool):
            entries = rng.choice(pool, size=min(self.n_entry_points, len(pool)),
                                 replace=False).astype(np.int32)
            self.entry_points = jnp.asarray(entries)
            self._refresh_entry_sample(vdev, pool, rng)

    def search(self, vecs_dev: jax.Array, queries: np.ndarray, k: int,
               ef: int = 64, mask: Optional[jax.Array] = None,
               steps: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        if self.neighbors is None:
            raise RuntimeError("graph not built")
        qdev = jnp.asarray(np.asarray(queries, np.float32))
        ef = max(ef, k)
        s, i = graph_search(vecs_dev, self.neighbors, self.entry_points, qdev,
                            mask, k, ef=ef, steps=steps or self.steps,
                            entry_sample_rows=getattr(self, "entry_sample_rows", None),
                            entry_sample_vecs=getattr(self, "entry_sample_vecs", None))
        return np.asarray(s), np.asarray(i).astype(np.int64)
