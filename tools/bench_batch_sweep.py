"""Hybrid QPS vs query batch size on the real chip.

The per-call cost has a large fixed component (tunnel dispatch + one packed
d2h fetch, ~27 ms — BENCH_NOTES.md), so QPS/chip scales with batch until
compute saturates. The serving layer's request coalescing (server.py) is what
makes large batches realistic under concurrent load. This probe builds the
bench corpus once and sweeps the fused hybrid program over batch sizes.

Usage: python tools/bench_batch_sweep.py   (env: N_DOCS, default 100k)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n = int(os.environ.get("N_DOCS", 100_000))
    dim = 384
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.index.hybrid import HybridSearcher

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((256, dim)).astype(np.float32)
    assign = rng.integers(0, 256, n)
    vecs = centers[assign] + 0.7 * rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    zipf = rng.zipf(1.3, size=(n, 48)) % 30_000
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]

    t0 = time.perf_counter()
    engine = DeviceVectorIndex(dim, initial_capacity=n)
    for s in range(0, n, 65536):
        c = vecs[s: s + 65536]
        engine.append(c, np.zeros(len(c), np.int8), np.zeros(len(c), np.int32),
                      np.full(len(c), 48, np.float32))
    bm25 = BM25Index()
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    searcher = HybridSearcher(engine, bm25)
    print(f"build {time.perf_counter() - t0:.1f}s ({n} docs)", flush=True)

    batches = tuple(int(x) for x in
                    os.environ.get("BATCHES", "256,512,1024").split(","))
    nq = max(4096, 2 * max(batches))
    qidx = rng.integers(0, n, nq)
    qd = vecs[qidx] + 0.25 * rng.standard_normal((nq, dim)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=1, keepdims=True)
    qt = [" ".join(texts[i].split()[:6]) for i in qidx]

    for b in batches:
        searcher.search_rows(qd[:b], qt[:b], dense_k=10, bm25_k=10,
                             fused_k=15, mode="int8")  # warm/compile
        ts = []
        for r in range(8):
            s = (r * b) % (nq - b)
            t0 = time.perf_counter()
            searcher.search_rows(qd[s: s + b], qt[s: s + b], dense_k=10,
                                 bm25_k=10, fused_k=15, mode="int8")
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"B={b:4d}: {med * 1000:6.1f} ms/batch -> {b / med:7.1f} QPS/chip",
              flush=True)


if __name__ == "__main__":
    main()
