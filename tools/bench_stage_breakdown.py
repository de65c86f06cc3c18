"""Per-stage + per-variant breakdown of the fused hybrid at large batch.

VERDICT r1 #4: at B=1024 x 1M docs the hybrid took 98.7 ms of which ~36 ms is
compute — the gap is (B, N) stage-1 score traffic. This probe measures, in ONE
process on the real chip (first-exec costs minutes per process — memory note
"axon-tpu-tunnel-behavior"):

  per-leg:   dense two-stage alone, bm25 sketch+rescore alone
  variants:  stage-1 selection f32 (round-1 behavior) vs bf16 vs bf16_chunked
  full:      fused hybrid under each policy + row-set agreement vs f32

Usage: N_DOCS=1000000 BATCH=1024 python tools/bench_stage_breakdown.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n = int(os.environ.get("N_DOCS", 1_000_000))
    batch = int(os.environ.get("BATCH", 1024))
    dim = 384
    top_k, fused_k = 10, 15
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.index.hybrid import HybridSearcher
    from radiant_rag_tpu.ops import quantize as qz
    from radiant_rag_tpu.ops import similarity as sim
    from radiant_rag_tpu.ops.bm25 import bm25_sketch_topk
    from radiant_rag_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((256, dim)).astype(np.float32)
    assign = rng.integers(0, 256, n)
    t0 = time.perf_counter()
    engine = DeviceVectorIndex(dim, initial_capacity=n)
    for s in range(0, n, 65536):
        m = min(65536, n - s)
        c = centers[assign[s:s + m]] + 0.7 * rng.standard_normal((m, dim)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        engine.append(c, np.zeros(m, np.int8), np.zeros(m, np.int32),
                      np.full(m, 48, np.float32))
    print(f"embed corpus on device: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    zipf = rng.zipf(1.3, size=(n, 48)) % 30_000
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]
    bm25 = BM25Index()
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    searcher = HybridSearcher(engine, bm25)
    print(f"bm25 build: {time.perf_counter()-t0:.1f}s", flush=True)

    qi = rng.integers(0, n, batch)
    queries_dense = centers[assign[qi]] + 0.7 * rng.standard_normal((batch, dim)).astype(np.float32)
    queries_dense /= np.linalg.norm(queries_dense, axis=1, keepdims=True)
    queries_text = [texts[i] for i in qi]

    results = {}

    # --- host query-prep timing --------------------------------------------
    bm25.ensure_sketch(engine.capacity)
    for _ in range(2):  # warm
        tids = bm25.query_tids(queries_text)
    t0 = time.perf_counter()
    for _ in range(3):
        tids = bm25.query_tids(queries_text)
    results["host/query_tids_ms"] = round((time.perf_counter() - t0) / 3 * 1000, 1)
    t0 = time.perf_counter()
    for _ in range(3):
        bm25.make_query_indicator(queries_text, tids)
        bm25.make_query_terms(queries_text, tids=tids)
    results["host/indicator_terms_ms"] = round((time.perf_counter() - t0) / 3 * 1000, 1)
    print(f"host prep: tids {results['host/query_tids_ms']} ms, "
          f"indicator+terms {results['host/indicator_terms_ms']} ms", flush=True)

    # --- per-leg probes (jit programs called directly) ---------------------
    qdev, qvalid, _ = engine._bucket_queries(queries_dense)
    i8_s, i8_o = qz.int8_scale_offset(engine.i8_lo, engine.i8_hi)
    kc = 40

    for sel in ("f32", "bf16", "bf16_chunked", "blockmax"):
        t = device_timer(lambda: sim.two_stage_topk(
            engine.vecs, qdev, engine.valid, top_k, kc, "int8",
            int8_codes=engine.i8, int8_scale=i8_s, int8_offset=i8_o,
            select=sel), iters=5)
        results[f"dense_leg/{sel}"] = round(t["median_ms"], 1)
        print(f"dense two-stage [{sel}]: {t['median_ms']:.1f} ms", flush=True)

    num_docs = engine.capacity
    bm25.ensure_sketch(num_docs)
    bm25.ensure_doc_major(num_docs)
    bm25._device_doc_lens(num_docs)
    qind = bm25.make_query_indicator(queries_text)
    if qind.shape[0] < qdev.shape[0]:
        qind = np.pad(qind, ((0, qdev.shape[0] - qind.shape[0]), (0, 0)))
    qind_dev = jnp.asarray(qind)
    for sel in ("f32", "bf16", "bf16_chunked", "blockmax"):
        t = device_timer(lambda: bm25_sketch_topk(
            bm25._sketch, bm25._sketch_scale, qind_dev, engine.valid, kc, sel),
            iters=5)
        results[f"bm25_sketch_select/{sel}"] = round(t["median_ms"], 1)
        print(f"bm25 sketch select [{sel}]: {t['median_ms']:.1f} ms", flush=True)

    # --- full hybrid under each policy -------------------------------------
    rows_by_sel = {}
    for sel in ("f32", "bf16", "bf16_chunked", "blockmax"):
        def run(sel=sel):
            return searcher.search_rows(queries_dense, queries_text,
                                        dense_k=top_k, bm25_k=top_k,
                                        fused_k=fused_k, mode="int8",
                                        bm25_mode="sketch", select=sel)
        run()  # warm (compile)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run()
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        rows_by_sel[sel] = out["fused"][1]
        results[f"hybrid/{sel}_ms"] = round(med * 1000, 1)
        results[f"hybrid/{sel}_qps"] = round(batch / med, 0)
        print(f"hybrid [{sel}]: {med*1000:.1f} ms -> {batch/med:.0f} QPS", flush=True)

    for sel in ("bf16", "bf16_chunked", "blockmax"):
        agree = np.mean([
            len(set(rows_by_sel[sel][q]) & set(rows_by_sel["f32"][q]))
            / max(1, np.sum(rows_by_sel["f32"][q] >= 0))
            for q in range(batch)])
        results[f"hybrid/{sel}_rowset_agreement"] = round(float(agree), 4)
        print(f"fused row-set agreement {sel} vs f32: {agree:.4f}", flush=True)

    # --- MXU/bandwidth accounting (VERDICT r3 #7) ---------------------------
    # The two stage-1 scans are the only O(B x N) terms; everything else is
    # O(B x k). Model each as max(MXU time, HBM time) and report measured
    # utilization of the binding resource. v5e peaks: 197 TFLOP/s bf16,
    # 394 TOP/s int8, ~819 GB/s HBM.
    PEAK_BF16, PEAK_INT8, PEAK_HBM = 197e12, 394e12, 819e9
    nvalid = engine.capacity
    flops_dense = 2.0 * batch * nvalid * dim
    bytes_dense = nvalid * dim  # int8 codes read once (queries/out negligible)
    s_sketch = bm25.sketch_dim
    flops_sketch = 2.0 * batch * nvalid * s_sketch
    bytes_sketch = float(nvalid) * s_sketch
    for key, flops, nbytes, peak in (
            ("dense_leg/f32", flops_dense, bytes_dense, PEAK_INT8),
            ("bm25_sketch_select/f32", flops_sketch, bytes_sketch, PEAK_INT8)):
        ms = results.get(key)
        if not ms:
            continue
        t = ms / 1000
        results[key + "_mxu_util"] = round(flops / t / peak, 3)
        results[key + "_hbm_util"] = round(nbytes / t / PEAK_HBM, 3)
    hyb = results.get("hybrid/f32_ms")
    if hyb:
        t = hyb / 1000
        results["hybrid/f32_mxu_util"] = round(
            (flops_dense + flops_sketch) / t / PEAK_INT8, 3)
        # the non-matmul residue: hybrid time minus the two measured scans
        scans = (results.get("dense_leg/f32", 0)
                 + results.get("bm25_sketch_select/f32", 0))
        results["hybrid/non_scan_residue_ms"] = round(hyb - scans, 1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
