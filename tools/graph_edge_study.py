#!/usr/bin/env python
"""Instrument WHICH true KNN edges NN-descent misses (VERDICT r2 #7).

The 1M convergence ceiling (~0.88 edge agreement vs 0.97 at 200k,
BENCH_NOTES) has a hypothesized cause — local exploration dynamics plus
rank-margin tie-noise — that was never measured. This tool classifies every
missed true edge on sampled nodes:

  rank      : position of the missed neighbor in the node's exact top-R
              (misses concentrated at high rank == tie-noise territory)
  margin    : sim(node, missed) - sim(node, weakest KEPT edge). margin <= 0
              means the kept edge is at least as good — metric tie-noise,
              not a real defect. margin >> 0 is a real miss.
  cluster   : intra- vs inter-cluster (the synthetic corpus has known
              assignments) — inter-cluster misses indicate the descent
              never escapes the local region
  in-degree : of the missed TARGET in the built graph — targets the whole
              descent under-discovered (hub starvation) vs locally missed

Usage:
  python tools/graph_edge_study.py --docs 200000            # build + study
  python tools/graph_edge_study.py --docs 1000000 --save-adj /tmp/adj.npy
  python tools/graph_edge_study.py --docs 1000000 --load-adj /tmp/adj.npy

Build runs NN-descent above 200k (the shipped recipe, `index/graph.py`);
the study itself is one (S, N) matmul for exact ground truth.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

import logging
logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_corpus(rng, n, dim=384, n_clusters=1024):
    """The bench/graph-scale corpus construction: clustered embeddings."""
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + 0.7 * rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs, assign


def exact_topk_sampled(vecs, sample_rows, k, block=200_000):
    """Exact top-(k+1) neighbors of sampled nodes over the full corpus
    (device matmul in corpus blocks; excludes self)."""
    import jax
    import jax.numpy as jnp

    q = jnp.asarray(vecs[sample_rows])  # (S, D)
    best_s = None
    best_i = None
    for start in range(0, vecs.shape[0], block):
        blk = jnp.asarray(vecs[start : start + block])
        sims = q @ blk.T  # (S, B)
        s, i = jax.lax.top_k(sims, min(k + 1, blk.shape[0]))
        i = i + start
        if best_s is None:
            best_s, best_i = s, i
        else:
            cs = jnp.concatenate([best_s, s], axis=1)
            ci = jnp.concatenate([best_i, i], axis=1)
            best_s, sel = jax.lax.top_k(cs, k + 1)
            best_i = jnp.take_along_axis(ci, sel, axis=1)
    s = np.asarray(best_s)
    i = np.asarray(best_i)
    # drop self-matches
    out_s = np.zeros((len(sample_rows), k), np.float32)
    out_i = np.zeros((len(sample_rows), k), np.int64)
    for r in range(len(sample_rows)):
        keep = i[r] != sample_rows[r]
        out_s[r] = s[r][keep][:k]
        out_i[r] = i[r][keep][:k]
    return out_s, out_i


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=200_000)
    parser.add_argument("--dim", type=int, default=384)
    parser.add_argument("--degree", type=int, default=16)
    parser.add_argument("--sample", type=int, default=2048)
    parser.add_argument("--save-adj", default="")
    parser.add_argument("--load-adj", default="")
    parser.add_argument("--iters", type=int, default=0,
                        help="override NN-descent rounds (0 = recipe default)")
    parser.add_argument("--no-polish", action="store_true",
                        help="disable the cluster-polish pass (A/B)")
    parser.add_argument("--tie-eps", type=float, default=1e-3,
                        help="margin below which a miss counts as tie-noise")
    args = parser.parse_args(argv)

    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(42)
    print(f"corpus: {args.docs} x {args.dim}", file=sys.stderr)
    vecs, assign = make_corpus(rng, args.docs, args.dim)

    R = args.degree
    if args.load_adj:
        adj = np.load(args.load_adj)
        build_s = 0.0
    else:
        from radiant_rag_tpu.index.graph import nn_descent_graph, build_knn_graph

        t0 = time.time()
        if args.docs <= 200_000 and not args.iters:
            adj = build_knn_graph(vecs, R, 0)
            method = "exact"
        else:
            kw = {"iters": args.iters} if args.iters else {}
            adj = nn_descent_graph(vecs, R, 0, seed=0,
                                   polish=not args.no_polish, **kw)
            method = "nn_descent"
        build_s = time.time() - t0
        print(f"{method} build: {build_s:.1f}s", file=sys.stderr)
        if args.save_adj:
            np.save(args.save_adj, adj)

    sample = rng.choice(args.docs, size=min(args.sample, args.docs),
                        replace=False)
    t0 = time.time()
    true_s, true_i = exact_topk_sampled(vecs, sample, R)
    print(f"exact ground truth: {time.time()-t0:.1f}s", file=sys.stderr)

    # in-degree of every row in the built graph (host bincount)
    flat = adj[:, :R].ravel()
    indeg = np.bincount(flat[flat >= 0], minlength=args.docs)

    missed_rank = np.zeros(R, np.int64)
    margins, missed_indeg, kept_cnt = [], [], 0
    intra_missed = inter_missed = intra_total = inter_total = 0
    for si, node in enumerate(sample):
        built = set(int(x) for x in adj[node, :R] if x >= 0)
        # weakest kept edge similarity
        kept_sims = [float(vecs[node] @ vecs[b]) for b in built] or [-1.0]
        weakest = min(kept_sims)
        for rank in range(R):
            t = int(true_i[si, rank])
            same = assign[node] == assign[t]
            if same:
                intra_total += 1
            else:
                inter_total += 1
            if t in built:
                kept_cnt += 1
                continue
            missed_rank[rank] += 1
            margins.append(float(true_s[si, rank]) - weakest)
            missed_indeg.append(int(indeg[t]))
            if same:
                intra_missed += 1
            else:
                inter_missed += 1

    margins = np.asarray(margins) if margins else np.zeros(1)
    total_edges = len(sample) * R
    n_missed = total_edges - kept_cnt
    report = {
        "docs": args.docs, "degree": R, "sample": len(sample),
        "build_s": round(build_s, 1),
        "edge_agreement": round(kept_cnt / total_edges, 4),
        "missed": n_missed,
        "missed_by_rank": {f"r{r+1}": int(missed_rank[r]) for r in range(R)},
        "margin": {
            "median": round(float(np.median(margins)), 5),
            "p90": round(float(np.quantile(margins, 0.9)), 5),
            "tie_noise_frac": round(float((margins <= args.tie_eps).mean()), 4),
            "real_miss_frac": round(float((margins > args.tie_eps).mean()), 4),
        },
        "cluster": {
            "intra_miss_rate": round(intra_missed / max(intra_total, 1), 4),
            "inter_miss_rate": round(inter_missed / max(inter_total, 1), 4),
            "inter_edge_frac_of_truth": round(
                inter_total / max(total_edges, 1), 4),
        },
        "missed_target_indegree": {
            "median": float(np.median(missed_indeg)) if missed_indeg else 0,
            "mean": round(float(np.mean(missed_indeg)), 2) if missed_indeg else 0,
            "graph_mean_indegree": round(float(indeg.mean()), 2),
            "zero_indegree_frac": round(
                float(np.mean(np.asarray(missed_indeg) == 0)), 4)
            if missed_indeg else 0,
        },
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
