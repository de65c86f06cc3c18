#!/usr/bin/env python
"""The >=10M HBM-bound regime (VERDICT r2 #6).

fp32-free residency on one chip: int8 codes (384 B/doc) + binary signatures
(48 B/doc) — ~4.3 GB at 10M x 384 — with chunked stage-1 selection so no
(B, N) score buffer ever materializes. Measures what the reference claims at
this scale (`/root/reference/docs/BINARY_QUANTIZATION_README.md:342-347`):

  - build/upload time into the fp32-free engine
  - flat int8 two-stage QPS/chip (sequential + pipelined) at --batch
  - recall@10 vs an exact fp32 host oracle on sampled queries
  - HBM residency accounting (actual device array bytes)
  - optionally (--graph) an NN-descent graph build + beam-search QPS/recall
    at the same memory budget, settling flat-vs-graph at 10M with data

Host RAM holds the fp32 corpus (15.4 GB at 10M) for generation + oracle;
the device never sees fp32 rows (store_fp32=False).

Usage: python tools/bench_10m.py [--docs 10000000] [--batch 1024] [--graph]
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_corpus_chunks(rng, n, dim, n_clusters=4096, chunk=1_000_000):
    # dtype=float32 generates natively at ~2x the f64-then-cast rate — on the
    # 1-core bench host the 10M corpus is minutes of wall clock, not noise
    centers = rng.standard_normal((n_clusters, dim), dtype=np.float32)
    out = np.empty((n, dim), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        assign = rng.integers(0, n_clusters, e - s)
        blk = centers[assign] + 0.7 * rng.standard_normal((e - s, dim), dtype=np.float32)
        blk /= np.linalg.norm(blk, axis=1, keepdims=True)
        out[s:e] = blk
    return out


def host_exact_topk(vecs, queries, k, chunk=2_000_000):
    """fp32 oracle on host, chunked so the (Q, N) matrix never materializes."""
    q = queries.astype(np.float32)
    best_s = np.full((len(q), k), -np.inf, np.float32)
    best_i = np.full((len(q), k), -1, np.int64)
    for s in range(0, vecs.shape[0], chunk):
        sims = q @ vecs[s : s + chunk].T
        cs = np.concatenate([best_s, sims], axis=1)
        ci = np.concatenate(
            [best_i, np.arange(s, s + sims.shape[1])[None, :].repeat(len(q), 0)],
            axis=1)
        sel = np.argpartition(-cs, k, axis=1)[:, :k]
        best_s = np.take_along_axis(cs, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
    order = np.argsort(-best_s, axis=1)
    return (np.take_along_axis(best_s, order, axis=1),
            np.take_along_axis(best_i, order, axis=1))


def run_traversal_bound(args, rng, vecs) -> int:
    """Beam-search traversal cost at N with a RANDOM adjacency.

    The beam kernel (`index/graph.graph_search`) executes the same gathers,
    einsums and top_k regardless of edge quality, so a random adjacency
    prices a perfectly-built graph's search exactly; recall is bounded above
    by the measured converged-build 1M beam recall (BENCH_NOTES). Skipping
    the descent build turns a multi-hour 10M experiment into minutes.
    """
    import jax.numpy as jnp

    from radiant_rag_tpu.index.graph import GraphIndex

    n, d = args.docs, args.dim
    g = GraphIndex(degree=16, n_long_edges=4)
    log("random adjacency (traversal-cost bound, no descent)...")
    adj = rng.integers(0, n, (n, 20), dtype=np.int64).astype(np.int32)
    g.neighbors = jnp.asarray(adj)
    g.entry_points = jnp.asarray(
        rng.choice(n, size=16, replace=False).astype(np.int32))
    g._refresh_entry_sample(vecs, np.arange(n), rng)
    g.built_rows = n

    nq = 256
    qidx = rng.integers(0, n, nq)
    qs = vecs[qidx] + 0.25 * rng.standard_normal((nq, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    vdev = jnp.asarray(vecs, jnp.bfloat16)
    report = {"docs": n, "dim": d, "mode": "graph_traversal_bound",
              "hbm_gb": round((adj.nbytes + vdev.nbytes) / 2**30, 2)}
    for ef in (32, 64, 128):
        t0 = time.time()
        g.search(vdev, qs, 10, ef=ef)
        warm = time.time() - t0
        times = []
        for _ in range(args.batches):
            t0 = time.time()
            g.search(vdev, qs, 10, ef=ef)
            times.append(time.time() - t0)
        ms = float(np.median(times)) * 1000
        log(f"beam ef={ef}: {ms:.1f} ms / {nq} queries (warm {warm:.1f}s) "
            f"-> {nq / (ms / 1000):.0f} QPS")
        report[f"ef{ef}"] = {"ms_per_batch": round(ms, 1),
                             "qps": round(nq / (ms / 1000), 1)}
    print(json.dumps(report))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=10_000_000)
    parser.add_argument("--dim", type=int, default=384)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--queries", type=int, default=256,
                        help="oracle sample size for recall")
    parser.add_argument("--batches", type=int, default=12,
                        help="timed batches per throughput measurement")
    parser.add_argument("--graph", action="store_true",
                        help="also build + measure the NN-descent graph")
    parser.add_argument("--graph-traversal-only", action="store_true",
                        help="measure beam-search traversal cost at --docs "
                             "with a RANDOM adjacency (no descent build): "
                             "gather/traversal cost depends only on N, "
                             "degree, ef and steps — not edge quality — so "
                             "this bounds what a perfectly-built graph could "
                             "cost, without the multi-hour 10M build")
    parser.add_argument("--iters", type=int, default=12,
                        help="NN-descent round ceiling for the 10M graph "
                             "(cluster polish recovers fine ranking)")
    parser.add_argument("--append-chunk", type=int, default=500_000)
    args = parser.parse_args(argv)

    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(42)
    n, d = args.docs, args.dim
    log(f"generating corpus {n} x {d} on host...")
    t0 = time.time()
    vecs = make_corpus_chunks(rng, n, d)
    log(f"corpus: {time.time()-t0:.1f}s ({vecs.nbytes/2**30:.1f} GB host)")

    if args.graph_traversal_only:
        # the flat engine (6.9 GB at 10M) cannot co-reside with the graph's
        # bf16 corpus (7.7 GB) + adjacency (0.8 GB) in 16 GB HBM; flat
        # numbers come from the non-graph run of this tool
        return run_traversal_bound(args, rng, vecs)

    log("building fp32-free engine (int8 + binary residency)...")
    t0 = time.time()
    eng = DeviceVectorIndex(d, initial_capacity=n, store_fp32=False,
                            stage1_select="bf16_chunked")
    levels = np.zeros(args.append_chunk, np.int8)
    langs = np.zeros(args.append_chunk, np.int32)
    dls = np.full(args.append_chunk, 48, np.float32)
    for s in range(0, n, args.append_chunk):
        e = min(s + args.append_chunk, n)
        eng.append(vecs[s:e], levels[: e - s], langs[: e - s], dls[: e - s])
    build_s = time.time() - t0
    hbm_bytes = sum(int(a.nbytes) for a in
                    (eng.codes, eng.i8, eng.valid, eng.level, eng.lang,
                     eng.doc_len))
    log(f"build/upload: {build_s:.1f}s; device residency "
        f"{hbm_bytes/2**30:.2f} GB (fp32-free)")

    # queries near corpus points (the bench construction)
    nq = max(args.queries, args.batch * 2)
    qidx = rng.integers(0, n, nq)
    queries = vecs[qidx] + 0.25 * rng.standard_normal((nq, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    K = 10
    B = args.batch
    # progressive warmup: small program first (remote-compile pathology)
    log("warmup B=32...")
    t0 = time.time()
    eng.search(queries[:32], K, mode="int8")
    log(f"warmup B=32: {time.time()-t0:.1f}s")
    t0 = time.time()
    eng.search(queries[:B], K, mode="int8")
    log(f"warmup B={B}: {time.time()-t0:.1f}s")

    times = []
    for i in range(args.batches):
        qs = queries[(i * B) % (nq - B): (i * B) % (nq - B) + B]
        t0 = time.time()
        eng.search(qs, K, mode="int8")
        times.append(time.time() - t0)
    seq_ms = float(np.median(times)) * 1000
    seq_qps = B / (seq_ms / 1000)
    log(f"flat int8 sequential: {seq_ms:.1f} ms/batch -> {seq_qps:.0f} QPS")

    # recall vs host fp32 oracle
    qs = queries[: args.queries]
    _, approx = eng.search(qs, K, mode="int8")
    t0 = time.time()
    _, exact = host_exact_topk(vecs, qs, K)
    log(f"host oracle: {time.time()-t0:.1f}s")
    recall = float(np.mean([
        len(set(approx[i][approx[i] >= 0]) & set(exact[i])) / K
        for i in range(len(qs))]))
    log(f"flat int8 recall@10 vs exact fp32: {recall:.4f}")

    report = {
        "docs": n, "dim": d, "batch": B,
        "build_upload_s": round(build_s, 1),
        "hbm_residency_gb": round(hbm_bytes / 2**30, 2),
        "flat_int8": {"seq_ms_per_batch": round(seq_ms, 1),
                      "seq_qps": round(seq_qps, 1),
                      "recall_at_10": round(recall, 4)},
    }

    if args.graph:
        from radiant_rag_tpu.index.graph import GraphIndex, nn_descent_graph

        import jax.numpy as _jnp
        t0 = time.time()
        g = GraphIndex(degree=16, n_long_edges=4)
        log("NN-descent graph build at scale (bf16 scoring + polish)...")
        adj = nn_descent_graph(vecs, 16, 4, iters=args.iters)
        g.neighbors = _jnp.asarray(adj)
        g.entry_points = _jnp.asarray(
            rng.choice(n, size=16, replace=False).astype(np.int32))
        g._refresh_entry_sample(vecs, np.arange(n), rng)
        g.built_rows = n
        gb = time.time() - t0
        log(f"graph build: {gb:.1f}s")
        import jax.numpy as jnp

        vdev = jnp.asarray(vecs, jnp.bfloat16)
        t0 = time.time()
        g.search(vdev, qs, K, ef=128)
        log(f"beam warmup: {time.time()-t0:.1f}s")
        times = []
        for i in range(args.batches):
            t0 = time.time()
            _, rows = g.search(vdev, qs, K, ef=128)
            times.append(time.time() - t0)
        gseq = float(np.median(times)) * 1000
        _, rows = g.search(vdev, qs, K, ef=128)
        grecall = float(np.mean([
            len(set(np.asarray(rows)[i]) & set(exact[i])) / K
            for i in range(len(qs))]))
        report["graph"] = {
            "build_s": round(gb, 1),
            "seq_ms_per_batch": round(gseq, 1),
            "seq_qps": round(len(qs) / (gseq / 1000), 1),
            "recall_at_10": round(grecall, 4),
            "extra_hbm_gb": round(
                (np.asarray(g.neighbors).nbytes + vdev.nbytes) / 2**30, 2),
        }

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
