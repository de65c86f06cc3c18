#!/usr/bin/env python
"""10M as a PRODUCT path, not an engine demo (VERDICT r3 #5).

Round 3 proved the bare engine at 10M (`tools/bench_10m.py`); the product
around it broke there: the in-RAM docstore held every chunk's text forever
and the (N, 1024) BM25 sketch could not coexist with the dense codes in
HBM. This drives the full product stack end-to-end at 10M docs on one chip:

  ingest   TpuVectorStore.upsert_batch (content-hash ids, quantized
           side-cars, SPILL docstore: content on disk, offset index in RAM)
           + BM25 bulk build (native CSR) with the HBM-budgeted sketch
           (auto-reduced S at this N)
  serve    fused hybrid search_rows (dense int8 two-stage + BM25 sketch +
           RRF) at the largest HBM-safe batch; sequential + pipelined QPS;
           content hydration for top hits through the spill docstore
  recall   dense stage recall@10 vs a chunked fp32 host oracle
  persist  save (engine npz + spill index delta) -> fresh-process-equivalent
           restore -> one warm hybrid batch to prove serving from disk
  budgets  HBM residency (device array bytes) + host-RAM high-water mark

Embeddings are synthetic clustered vectors streamed straight into
upsert_batch — the real encoder's ingest throughput is measured separately
(BENCH_NOTES embedding table; 11.5k chunks/s) and is corpus-size-free, so
coupling it here would only add 15 minutes of constant. Texts are zipfian
token strings (same family as bench.py).

Reference anchor: `/root/reference/docs/BINARY_QUANTIZATION_README.md:342-347`
(the 10M/100M scaling story this framework must state with measurements).

Usage: python tools/bench_10m_product.py [--docs 10000000] [--batch 0 (auto)]
"""

from __future__ import annotations

import argparse
import json
import logging
import pathlib
import resource
import shutil
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from bench_10m import host_exact_topk, log, make_corpus_chunks  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--batch", type=int, default=0, help="0 = engine auto")
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--upsert-chunk", type=int, default=65_536)
    ap.add_argument("--data-dir", default="data/bench_10m_product")
    ap.add_argument("--keep", action="store_true",
                    help="keep the persisted index after the run")
    ap.add_argument("--bm25-budget", type=float, default=3.0,
                    help="BM25 device HBM budget (GB). The 3.0 default lands "
                         "on the pages-only tier at 10M (measured: 25 QPS); "
                         "4.5 admits the S=128 sketch tier next to the "
                         "fp32-free engine (4.1 GB) within 16 GB")
    ap.add_argument("--out", default="data/bench_10m_product.json")
    args = ap.parse_args(argv)

    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.hybrid import HybridSearcher
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(42)
    n, d = args.docs, args.dim
    data_dir = args.data_dir
    shutil.rmtree(data_dir, ignore_errors=True)

    # Phase-wise incremental artifact: every completed phase flushes to
    # args.out with partial=true, so a run killed mid-flight (tunnel death,
    # wall-clock watchdog) still leaves its measured numbers on disk.
    report = {"metric": "product_path_10m", "docs": n, "dim": d,
              "bm25_budget_gb": args.bm25_budget, "partial": True,
              "timings_s": {}, "device": _device_kind()}
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    def flush() -> None:
        tmp = out.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(report, indent=2))
        tmp.replace(out)

    log(f"generating corpus {n} x {d}...")
    t0 = time.time()
    vecs = make_corpus_chunks(rng, n, d)
    vocab = 30_000
    zipf = rng.zipf(1.3, size=(n, 24)) % vocab
    t_gen = time.time() - t0
    log(f"corpus: {t_gen:.1f}s ({vecs.nbytes / 2**30:.1f} GB host fp32)")
    report["timings_s"]["corpus_gen"] = round(t_gen, 1)
    flush()

    def text_of(i: int) -> str:
        return " ".join(f"w{t}" for t in zipf[i])

    # ---- ingest through the product store (spill docstore, fp32-free) ----
    cfg = IndexConfig(dim=d, initial_capacity=n, store_fp32=False,
                      data_dir=data_dir, docstore="spill",
                      docstore_cache_docs=100_000, auto_persist=False)
    store = TpuVectorStore(dim=d, index_config=cfg)
    store.reserve(n)
    t0 = time.time()
    bs = args.upsert_chunk
    for s in range(0, n, bs):
        e = min(s + bs, n)
        store.upsert_batch([
            (text_of(i), {"doc_level": "leaf"}, vecs[i]) for i in range(s, e)])
        if (s // bs) % 16 == 0:
            log(f"  ingested {e}/{n} ({e / max(time.time() - t0, 1e-9):.0f}/s, "
                f"rss {rss_gb():.1f} GB)")
    t_ingest = time.time() - t0
    log(f"ingest: {t_ingest:.1f}s ({n / t_ingest:.0f} docs/s)")
    report["timings_s"]["ingest"] = round(t_ingest, 1)
    report["timings_s"]["ingest_docs_per_s"] = round(n / t_ingest, 0)
    flush()

    t0 = time.time()
    # sketch_dim 1024 is the configured ceiling; plan_hbm walks the degrade
    # ladder (smaller S -> pages-only) to fit --bm25-budget at this N
    bm25 = BM25Index(sketch_hbm_budget_gb=args.bm25_budget)
    bm25.bulk_build(list(range(n)), [text_of(i) for i in range(n)])
    bm25._finalize_csr()
    t_bm25 = time.time() - t0
    log(f"bm25 build: {t_bm25:.1f}s")
    report["timings_s"]["bm25_build"] = round(t_bm25, 1)
    flush()

    searcher = HybridSearcher(store.engine, bm25)
    # hybrid gate, not engine gate: at the pages-only 10M tier the BM25 legs
    # still materialize (B, N) while the chunked dense select does not
    bq = args.batch or min(1024, searcher.max_query_bucket())
    log(f"query batch: {bq} (hybrid max {searcher.max_query_bucket()}, "
        f"engine max {store.engine.max_query_bucket()})")

    qidx = rng.integers(0, n, args.queries)
    oracle_q = vecs[qidx] + 0.25 * rng.standard_normal(
        (args.queries, d)).astype(np.float32)
    oracle_q /= np.linalg.norm(oracle_q, axis=1, keepdims=True)
    q_dense = np.tile(oracle_q, (bq // args.queries + 1, 1))[:bq]
    q_texts = [" ".join(text_of(i).split()[:6]) for i in qidx]
    q_texts = (q_texts * (bq // len(q_texts) + 1))[:bq]

    mode = store._default_mode()
    log(f"dense mode: {mode}; warming (progressive)...")
    t0 = time.time()
    searcher.search_rows(q_dense[:32], q_texts[:32], dense_k=10, bm25_k=10,
                         fused_k=10, mode=mode)
    t_warm_small = time.time() - t0
    t0 = time.time()
    searcher.search_rows(q_dense, q_texts, dense_k=10, bm25_k=10,
                         fused_k=10, mode=mode)
    t_warm = time.time() - t0
    log(f"warmup: B=32 {t_warm_small:.1f}s, B={bq} {t_warm:.1f}s "
        f"(sketch dim now {bm25.sketch_dim})")
    report.update(batch=bq, dense_mode=mode,
                  bm25_sketch_dim_effective=bm25.sketch_dim)
    report["timings_s"]["warmup_small"] = round(t_warm_small, 1)
    report["timings_s"]["warmup_full"] = round(t_warm, 1)
    flush()

    times = []
    for _ in range(args.batches):
        t0 = time.time()
        res = searcher.search_rows(q_dense, q_texts, dense_k=10, bm25_k=10,
                                   fused_k=10, mode=mode)
        times.append(time.time() - t0)
    seq_qps = bq / float(np.median(times))
    log(f"hybrid sequential: {float(np.median(times))*1000:.0f} ms/batch "
        f"-> {seq_qps:.0f} QPS")
    report["hybrid_qps_sequential"] = round(seq_qps, 1)
    flush()

    pipe_qps = 0.0
    for _ in range(3):
        t0 = time.time()
        unpacks = []
        for _b in range(args.batches):
            _, u = searcher.search_rows(q_dense, q_texts, dense_k=10,
                                        bm25_k=10, fused_k=10, mode=mode,
                                        fetch=False)
            unpacks.append(u)
        for u in unpacks:
            u()
        pipe_qps = max(pipe_qps, args.batches * bq / (time.time() - t0))
    log(f"hybrid pipelined: {pipe_qps:.0f} QPS")
    report["hybrid_qps_pipelined"] = round(pipe_qps, 1)
    flush()

    # hydrate top hits through the spill docstore (content fetch from disk)
    t0 = time.time()
    fs, fr = res["fused"]
    hydrated = 0
    for qi in range(min(64, bq)):
        for r in fr[qi][:3]:
            if r >= 0:
                doc_id = store.id_for_row(int(r))
                doc = store.get_doc(doc_id) if doc_id else None
                hydrated += doc is not None
    t_hydrate = time.time() - t0
    log(f"hydrated {hydrated} hits via spill docstore in {t_hydrate:.2f}s")

    # dense recall vs fp32 host oracle
    _, oracle_rows = host_exact_topk(vecs, oracle_q, 10)
    s_dev, r_dev = store.engine.search(oracle_q, 10, mode=mode)
    recall = np.mean([
        len(set(map(int, r_dev[i][r_dev[i] >= 0]))
            & set(map(int, oracle_rows[i]))) / 10
        for i in range(args.queries)])
    log(f"dense recall@10 vs fp32 oracle: {recall:.4f}")
    report["dense_recall_at_10_vs_fp32"] = round(float(recall), 4)
    flush()

    # HBM accounting
    eng = store.engine
    hbm = 0
    for name in ("codes", "i8", "vecs", "level", "lang", "doc_len", "valid"):
        arr = getattr(eng, name, None)
        if arr is not None and hasattr(arr, "nbytes"):
            hbm += arr.nbytes
    bm_dev = bm25.device_bytes_projected(eng.capacity)
    log(f"HBM: engine {hbm / 2**30:.2f} GB + bm25 device {bm_dev / 2**30:.2f} "
        f"GB (sketch S={bm25.sketch_dim}; 0 = pages-only tier)")
    report["hbm_gb"] = {"engine": round(hbm / 2**30, 2),
                        "bm25_device": round(bm_dev / 2**30, 2)}
    flush()

    # ---- persist -> restore -> serve ----
    t0 = time.time()
    store.save(data_dir)
    t_save = time.time() - t0
    disk = sum(f.stat().st_size for f in pathlib.Path(data_dir).rglob("*")
               if f.is_file())
    log(f"save: {t_save:.1f}s ({disk / 2**30:.2f} GB on disk)")
    report["timings_s"]["save"] = round(t_save, 1)
    report["disk_gb"] = round(disk / 2**30, 2)
    report["host_ram_high_water_gb"] = round(rss_gb(), 1)
    flush()

    del searcher, res  # drop every ref to the old engine's device arrays —
    del store          # two 10M corpora cannot coexist in HBM at restore
    t0 = time.time()
    store2 = TpuVectorStore.load(data_dir, index_config=cfg)
    t_load = time.time() - t0
    searcher2 = HybridSearcher(store2.engine, bm25)
    t0 = time.time()
    res2 = searcher2.search_rows(q_dense, q_texts, dense_k=10, bm25_k=10,
                                 fused_k=10, mode=mode)
    t_first = time.time() - t0
    _fs2, fr2 = res2["fused"]
    doc_id = store2.id_for_row(int(fr2[0][0]))
    doc = store2.get_doc(doc_id)
    assert doc is not None and doc.content, "restore lost content"
    log(f"restore: load {t_load:.1f}s, first warm hybrid batch {t_first:.1f}s, "
        f"content hydrates from spill")

    report["timings_s"]["restore_load"] = round(t_load, 1)
    report["timings_s"]["restore_first_batch"] = round(t_first, 1)
    report["host_ram_high_water_gb"] = round(rss_gb(), 1)
    report["partial"] = False
    flush()
    print(json.dumps(report, indent=2))
    if not args.keep:
        shutil.rmtree(data_dir, ignore_errors=True)
    return 0


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.exit(main())
