#!/usr/bin/env python
"""Pod-path performance shape on the 8-device virtual mesh (VERDICT r4 #6).

The sharded backend (`parallel/sharded_index.py`, `parallel/sharded_store.py`)
is correctness-proven by tests and the driver dryrun, but carried zero perf
accounting. Real multi-chip hardware is not available in this environment, so
this measures the OVERHEAD SHAPE on the 8-device virtual CPU mesh (one host
core — absolute times are not chip numbers; the DELTAS between configurations
are the quantities of interest and are host-dominated the same way a pod's
per-host merge work would be):

  single          hybrid over the whole corpus on one device (baseline)
  single@N/8      hybrid over a 1/8 corpus on one device — the ideal
                  per-shard local work a pod member does
  sharded         ShardedHybridIndex.hybrid_search over mesh(4x2): per-shard
                  local top-k + all_gather merge in ONE jit program
                  -> collective_overhead = sharded - single@N/8
  store base      ShardedVectorStore.search_hybrid with an empty delta
  store +5%       same with a 5% delta segment (base program + single-device
                  delta program + per-leg host merge)
  rebase          store.refresh() after the delta crosses the rebase
                  threshold (full re-shard of base+delta)

Writes bench_artifacts/pod_path.json.

Reference anchor: the reference's distribution story is N clients sharing
one Redis (`/root/reference/docs/DOCKER_README.md`); SURVEY §5.8 makes the
mesh layer the core of the >=20x target, so it must carry numbers, not just
green tests.

Usage:
  python tools/bench_pod_path.py [--docs 200000] [--batch 256] [--dim 128]
(pins JAX to CPU with 8 virtual devices itself; run from any env)
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

# must precede any jax import: virtual 8-device CPU topology
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize registers axon


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_corpus(rng, n: int, dim: int):
    centers = rng.standard_normal((128, dim)).astype(np.float32)
    assign = rng.integers(0, 128, n)
    vecs = centers[assign] + 0.7 * rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    zipf = rng.zipf(1.3, size=(n, 32)) % 20_000
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]
    return vecs, texts


def timed_ms(fn, reps: int = 5) -> float:
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def build_single(vecs, texts):
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.index.hybrid import HybridSearcher

    n = len(texts)
    engine = DeviceVectorIndex(vecs.shape[1], initial_capacity=n)
    engine.append(vecs, np.zeros(n, np.int8), np.zeros(n, np.int32),
                  np.full(n, 32, np.float32))
    bm25 = BM25Index(sketch_dim=512)
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    return HybridSearcher(engine, bm25)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--out", default="bench_artifacts/pod_path.json")
    args = ap.parse_args(argv)

    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.parallel.mesh import create_mesh
    from radiant_rag_tpu.parallel.sharded_index import ShardedHybridIndex

    n, b, d, k = args.docs, args.batch, args.dim, args.top_k
    rng = np.random.default_rng(7)
    vecs, texts = make_corpus(rng, n, d)
    qidx = rng.integers(0, n, b)
    qd = vecs[qidx] + 0.25 * rng.standard_normal((b, d)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=1, keepdims=True)
    qt = [" ".join(texts[i].split()[:5]) for i in qidx]
    report = {"docs": n, "batch": b, "dim": d, "top_k": k,
              "devices": len(jax.devices()), "host_cores": os.cpu_count()}

    # --- single-device baselines ------------------------------------------
    log("building single-device baseline...")
    single = build_single(vecs, texts)
    report["single_hybrid_ms"] = round(timed_ms(lambda: single.search_rows(
        qd, qt, dense_k=k, bm25_k=k, fused_k=k)), 1)
    log(f"single: {report['single_hybrid_ms']} ms/batch")

    n8 = n // 8
    single8 = build_single(vecs[:n8], texts[:n8])
    qt8 = qt  # same queries
    report["single_eighth_hybrid_ms"] = round(timed_ms(
        lambda: single8.search_rows(qd, qt8, dense_k=k, bm25_k=k, fused_k=k)), 1)
    log(f"single @ N/8: {report['single_eighth_hybrid_ms']} ms/batch")

    # --- sharded hybrid (one jit program: local top-k + all_gather merge) --
    mesh = create_mesh(data=4, model=2)
    bm25 = BM25Index(sketch_dim=512)
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    log("building sharded hybrid index...")
    t0 = time.perf_counter()
    sharded = ShardedHybridIndex(mesh, vecs, bm25)
    report["sharded_build_s"] = round(time.perf_counter() - t0, 1)
    report["sharded_hybrid_ms"] = round(timed_ms(lambda: sharded.hybrid_search(
        qd, qt, dense_k=k, bm25_k=k, fused_k=k)), 1)
    report["collective_overhead_ms"] = round(
        report["sharded_hybrid_ms"] - report["single_eighth_hybrid_ms"], 1)
    log(f"sharded: {report['sharded_hybrid_ms']} ms/batch "
        f"(collective overhead {report['collective_overhead_ms']} ms)")

    # dense-only split of the same comparison
    report["single_dense_ms"] = round(timed_ms(
        lambda: single.engine.search(qd, k)), 1)
    report["sharded_dense_ms"] = round(timed_ms(
        lambda: sharded.search(qd, k)), 1)

    # --- ShardedVectorStore: delta serving + rebase ------------------------
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

    ns = min(n, 50_000)  # store path is host-heavier; keep the build bounded
    log(f"building ShardedVectorStore over {ns} docs...")
    source = TpuVectorStore(dim=d, index_config=IndexConfig(
        dim=d, initial_capacity=ns + ns // 10))
    source.reserve(ns)
    bs = 8192
    for s in range(0, ns, bs):
        source.upsert_batch([(texts[i], {}, vecs[i])
                             for i in range(s, min(ns, s + bs))])
    sb = BM25Index(sketch_dim=512)
    sb.bulk_build(list(range(ns)), texts[:ns])
    sb._finalize_csr()
    served = ShardedVectorStore(mesh, source, bm25_index=sb)
    q_store = qd[:64]
    qt_store = qt[:64]
    report["store_base_hybrid_ms"] = round(timed_ms(
        lambda: served.search_hybrid(q_store, qt_store, top_k=k)), 1)
    log(f"store base: {report['store_base_hybrid_ms']} ms/64-query batch")

    # writes through the served store land in its single-device delta
    # segment (served immediately); 4% stays under the 5% auto-rebase
    n_delta = ns // 25
    t0 = time.perf_counter()
    served.upsert_batch([
        (f"delta doc {i} " + texts[i % ns], {},
         vecs[(i * 13) % ns] + 0.05 * rng.standard_normal(d).astype(np.float32))
        for i in range(n_delta)])
    report["delta_ingest_s"] = round(time.perf_counter() - t0, 1)
    report["delta_docs"] = served.delta_size
    report["store_delta_hybrid_ms"] = round(timed_ms(
        lambda: served.search_hybrid(q_store, qt_store, top_k=k)), 1)
    report["delta_overhead_ms"] = round(
        report["store_delta_hybrid_ms"] - report["store_base_hybrid_ms"], 1)
    log(f"store +{n_delta} delta ({report['delta_docs']} live): "
        f"{report['store_delta_hybrid_ms']} ms/batch "
        f"(+{report['delta_overhead_ms']} ms)")

    # rebase = refresh(): fold the delta back into the sharded base
    t0 = time.perf_counter()
    served.refresh()
    report["rebase_s"] = round(time.perf_counter() - t0, 1)
    report["post_rebase_delta_docs"] = served.delta_size
    report["store_post_rebase_hybrid_ms"] = round(timed_ms(
        lambda: served.search_hybrid(q_store, qt_store, top_k=k)), 1)
    log(f"rebase: {report['rebase_s']} s; post-rebase "
        f"{report['store_post_rebase_hybrid_ms']} ms/batch")

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
