"""On-chip A/B: XLA two-stage int8 scan vs the Pallas fused scan->top-K.

The Pallas stage-1 (`ops/pallas_kernels.int8_scan_topk_pallas`) keeps the
running top-K in VMEM scratch and never materializes the (B, N) score matrix
in HBM; at large N that HBM traffic is what the XLA path pays. This probe
measures both engine paths end-to-end (including the packed host fetch) at a
configurable corpus size and reports steady-state latency, QPS, and top-k
row-set agreement.

Usage (real TPU): python tools/bench_pallas_scan.py
Env: N_ROWS (default 1M), DIM (384), BATCH (32), TOPK (10), RESCORE_MULT (4).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n = int(os.environ.get("N_ROWS", 1 << 20))
    dim = int(os.environ.get("DIM", 384))
    b = int(os.environ.get("BATCH", 32))
    k = int(os.environ.get("TOPK", 10))
    mult = float(os.environ.get("RESCORE_MULT", 4.0))

    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    print(f"backend={jax.default_backend()} n={n} dim={dim} batch={b} k={k}",
          flush=True)
    rng = np.random.default_rng(0)
    eng = DeviceVectorIndex(dim=dim, initial_capacity=n)
    chunk = 1 << 16
    t0 = time.perf_counter()
    for s in range(0, n, chunk):
        v = rng.standard_normal((min(chunk, n - s), dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        p = len(v)
        eng.append(v, np.zeros(p, np.int8), np.zeros(p, np.int32),
                   np.ones(p, np.float32))
    print(f"built {eng.count} rows (capacity {eng.capacity}) "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    def timed(label):
        t0 = time.perf_counter()
        eng.search(q, k=k, mode="int8", rescore_multiplier=mult)
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            s, r = eng.search(q, k=k, mode="int8", rescore_multiplier=mult)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label}: warm {warm:.2f}s, steady {med * 1000:.1f} ms/batch "
              f"({b / med:.0f} QPS)", flush=True)
        return s, r, med

    eng.use_pallas_scan = False
    s_x, r_x, t_x = timed("xla_two_stage")
    eng.use_pallas_scan = True
    s_p, r_p, t_p = timed("pallas_fused ")
    agree = float(np.mean([len(set(r_x[i]) & set(r_p[i])) / k for i in range(b)]))
    print(f"top-{k} row-set agreement: {agree:.3f}")
    print(f"pallas vs xla speedup: {t_x / t_p:.2f}x")


if __name__ == "__main__":
    main()
