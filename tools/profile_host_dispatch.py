"""Where does the per-batch host time go in the fused hybrid?

The 100k pipelined bench shows ~87 ms/batch even with fetches overlapped —
far above device compute at that corpus size — so the bottleneck moved to the
synchronous host side of `HybridSearcher.search_rows`: query tokenization,
page/indicator building, padding, and h2d uploads through the device tunnel
(each `jnp.asarray` is a separate round trip).

Times, per 1024-query batch over an N-doc corpus:
  tokenize      bm25.query_tids
  qind          make_query_indicator (numpy)
  qterms        make_query_terms (numpy)
  bucket        engine._bucket_queries (pad + 2 uploads)
  h2d_each      each remaining upload (qind/q_tids/q_idfs) individually
  dispatch      fused program call with everything device-resident
  exec          steady-state device execution (device_timer)
  full          search_rows(fetch=False) wall + unpack wall

Usage: N_DOCS=100000 BATCH=1024 python tools/profile_host_dispatch.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(fn, reps=8):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


def main() -> None:
    n = int(os.environ.get("N_DOCS", 100_000))
    batch = int(os.environ.get("BATCH", 1024))
    dim = 384
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.index.hybrid import HybridSearcher
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
    zipf = rng.zipf(1.3, size=(n, 48)) % 30_000
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]
    bm25 = BM25Index()
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    searcher = HybridSearcher(engine, bm25)
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)

    qidx = rng.integers(0, n, batch)
    qd = centers[assign[qidx]] + 0.25 * rng.standard_normal((batch, dim)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=1, keepdims=True)
    qt = [" ".join(texts[i].split()[:6]) for i in qidx]

    # warm the full path (progressive for big corpora)
    t0 = time.perf_counter()
    if n > 200_000:
        searcher.search_rows(qd[:32], qt[:32])
    searcher.search_rows(qd, qt)
    print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

    ms = {}
    ms["tokenize"] = t(lambda: bm25.query_tids(qt))
    tids = bm25.query_tids(qt)
    ms["qind"] = t(lambda: bm25.make_query_indicator(qt, tids))
    ms["qterms"] = t(lambda: bm25.make_query_terms(qt, tids=tids))
    ms["bucket"] = t(lambda: engine._bucket_queries(qd))
    qind = bm25.make_query_indicator(qt, tids)
    q_tids, q_idfs = bm25.make_query_terms(qt, tids=tids)
    ms["h2d_qind"] = t(lambda: jnp.asarray(qind).block_until_ready())
    ms["h2d_qtids"] = t(lambda: jnp.asarray(q_tids).block_until_ready())
    ms["h2d_qidfs"] = t(lambda: jnp.asarray(q_idfs).block_until_ready())
    ms["h2d_queries"] = t(lambda: jnp.asarray(qd).block_until_ready())
    # one PACKED upload of the same bytes (tunnel round-trip amortization probe)
    total_bytes = qind.nbytes + q_tids.nbytes + q_idfs.nbytes + qd.astype(np.float32).nbytes
    blob = np.empty(total_bytes, np.uint8)
    ms["h2d_packed_once"] = t(lambda: jnp.asarray(blob).block_until_ready())

    # dispatch-only: everything device-resident, call the jit program
    dev = {}
    from radiant_rag_tpu.index import hybrid as H
    from radiant_rag_tpu.ops import quantize as qz

    num_docs = engine.capacity
    bm25.ensure_sketch(num_docs)
    bm25.ensure_doc_major(num_docs)
    bm25._device_doc_lens(num_docs)
    qdev, qvalid, _ = engine._bucket_queries(qd)
    scale, offset = qz.int8_scale_offset(engine.i8_lo, engine.i8_hi)
    select = engine.stage1_select
    args = dict(
        common=(engine.vecs, engine.codes, engine.i8, scale, offset,
                engine.valid, engine.level, engine.lang),
        sk=(bm25._sketch, bm25._sketch_scale, jnp.asarray(qind),
            bm25._dm_tids, bm25._dm_tfs, bm25._dl_dev,
            jnp.asarray(np.float32(bm25.avgdl)),
            jnp.asarray(q_tids), jnp.asarray(q_idfs)),
        codes=(qdev, qvalid, jnp.asarray(np.int32(-1)), jnp.asarray(np.int32(-1)),
               jnp.asarray(searcher.leg_weights)),
    )
    kc = 40
    bm_kc = 40

    def dispatch():
        return H._hybrid_program_sketch(
            *args["common"], *args["sk"], *args["codes"],
            10, 10, 15, 60, kc, bm_kc, "int8", 1.5, 0.75, "confidence", select)

    out = dispatch()
    out.block_until_ready()
    ms["dispatch_nosync"] = t(lambda: dispatch())
    ms["exec_device"] = device_timer(dispatch, iters=8)["median_ms"]

    def full_nofetch():
        _, unpack = searcher.search_rows(qd, qt, fetch=False)
        return unpack

    ms["search_rows_nofetch"] = t(full_nofetch)
    unpack = full_nofetch()
    ms["unpack_fetch"] = t(lambda: unpack())

    def full():
        searcher.search_rows(qd, qt)

    ms["search_rows_full"] = t(full, reps=4)

    for k, v in ms.items():
        print(f"{k:22s} {v:8.1f} ms")


if __name__ == "__main__":
    main()
