"""Graph engine at scale: NN-descent build time + beam-search recall/latency.

ROADMAP open item: the graph engine's large-corpus story. The exact tiled
KNN build is O(N^2 D) (81 s at 131k rows round 1 => ~80 min at 1M); the
NN-descent build (`index/graph.nn_descent_graph`) is O(N * C * iters) and is
what makes 1M-10M graphs buildable at all. This probe measures, on the real
chip:

  build      nn-descent wall time at N rows (vs projected exact-build time)
  search     batched beam search ms/batch at B queries, several ef points
  recall@10  vs the exact f32 scan oracle on the same queries

Usage: N_DOCS=1000000 BATCH=256 python tools/bench_graph_scale.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n = int(os.environ.get("N_DOCS", 1_000_000))
    batch = int(os.environ.get("BATCH", 256))
    d = int(os.environ.get("DIM", 384))
    iters = int(os.environ.get("ITERS", 8))
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from radiant_rag_tpu.index.graph import GraphIndex
    from radiant_rag_tpu.ops.similarity import exact_topk
    from radiant_rag_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(42)
    # CLUSTERS controls tie density: points-per-cluster = N / CLUSTERS. The
    # 1M run uses 1024 clusters (~1000 pts/cluster); setting CLUSTERS so a
    # smaller N reproduces the same density isolates near-tie effects from
    # corpus size (see BENCH_NOTES "graph search-side diagnosis").
    n_clusters = int(os.environ.get("CLUSTERS", 1024))
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    vecs = np.empty((n, d), np.float32)
    for s in range(0, n, 131072):
        e = min(s + 131072, n)
        c = centers[assign[s:e]] + 0.6 * rng.standard_normal((e - s, d)).astype(np.float32)
        vecs[s:e] = c / np.linalg.norm(c, axis=1, keepdims=True)
    print(f"corpus: {n} x {d}", flush=True)

    from radiant_rag_tpu.index.graph import nn_descent_graph

    gi = GraphIndex(degree=16, n_long_edges=4, n_entry_points=16, steps=8)
    t0 = time.perf_counter()
    two_level = os.environ.get("TWO_LEVEL", "0") == "1"
    adj = nn_descent_graph(vecs, degree=16, n_long_edges=4, iters=iters,
                           two_level=two_level)
    gi.neighbors = jnp.asarray(adj)
    gi.entry_points = jnp.asarray(
        rng.choice(n, size=16, replace=False).astype(np.int32))
    gi._refresh_entry_sample(vecs, np.arange(n), rng)
    gi.built_rows = n
    gi._full_built_rows = n
    build_s = time.perf_counter() - t0
    print(f"nn-descent build ({iters} max iters): {build_s:.1f}s", flush=True)

    # build quality: sampled edge agreement vs exact top-16 (1k nodes)
    sample = rng.choice(n, 1024, replace=False)
    sdev = jnp.asarray(vecs[sample])
    vdev0 = jnp.asarray(vecs)
    _, exact16 = exact_topk(vdev0, sdev, None, 17)
    exact16 = np.asarray(exact16)
    agree = np.mean([
        len(set(adj[sample[i], :16]) & set(exact16[i])) / 16
        for i in range(len(sample))
    ])
    print(f"sampled KNN edge agreement vs exact: {agree:.3f}", flush=True)

    qidx = rng.integers(0, n, batch)
    q = vecs[qidx] + 0.2 * rng.standard_normal((batch, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    vdev = jnp.asarray(vecs)
    qdev = jnp.asarray(q)

    # oracle: exact f32 scan (top-50 kept to separate fine-ranking loss from
    # coverage loss: a beam hit inside oracle-top-50 but outside top-10 is a
    # near-tie mis-ranking, not a navigation failure)
    t0 = time.perf_counter()
    oracle_s50, oracle50 = exact_topk(vdev, qdev, None, 50)
    oracle50 = np.asarray(oracle50)
    oracle_s50 = np.asarray(oracle_s50)
    oracle = oracle50[:, :10]
    oracle_top10_mean = float(oracle_s50[:, :10].mean())
    exact_ms = (time.perf_counter() - t0) * 1000
    print(f"exact scan (cold): {exact_ms:.1f} ms / {batch} queries", flush=True)
    exact_t = device_timer(lambda: exact_topk(vdev, qdev, None, 10), iters=5)
    print(f"exact scan steady: {exact_t['median_ms']:.1f} ms / batch", flush=True)

    for ef, steps in ((32, 8), (64, 8), (128, 8), (64, 16), (128, 16), (128, 24)):
        t0 = time.perf_counter()
        scores, rows = gi.search(vdev, q, k=10, ef=ef, steps=steps)
        cold = (time.perf_counter() - t0) * 1000
        t = device_timer(lambda: gi.search(vdev, q, k=10, ef=ef, steps=steps),
                         iters=5)
        rec = np.mean([
            len(set(rows[i][rows[i] >= 0]) & set(oracle[i])) / 10
            for i in range(batch)
        ])
        # near-tie diagnostics: recall against the oracle's top-50 (coverage
        # of the right neighborhood) and mean cosine regret of the beam's
        # top-10 vs the oracle's top-10 (how much score is actually lost)
        rec50 = np.mean([
            len(set(rows[i][rows[i] >= 0]) & set(oracle50[i])) / 10
            for i in range(batch)
        ])
        valid = rows >= 0
        beam_mean = float(np.where(valid, scores, 0.0).sum() / valid.sum())
        regret = oracle_top10_mean - beam_mean
        print(f"graph ef={ef:3d} steps={steps:2d}: {t['median_ms']:7.1f} ms/batch "
              f"(cold {cold:.0f} ms)  recall@10={rec:.3f}  "
              f"in-oracle50={rec50:.3f}  score-regret={regret:.5f}", flush=True)


if __name__ == "__main__":
    main()
