"""BM25 sketch_dim speed/fidelity trade at 1M docs (round 3).

The stage breakdown at 1M x B=2048 shows the BM25 sketch select is the most
expensive fused-hybrid stage (63-70 ms vs the dense leg's 44 ms): the int8
MXU matmul is (B, S) x (N, S) with S = sketch_dim = 1024. Halving S halves
that matmul's FLOPs and HBM reads — IF the hashed-bin collisions at S=512
don't degrade the leg's final top-10 (stage-2 rescores candidates with exact
BM25, so fidelity = does the true top-10 survive stage-1 selection).

Measures, per sketch_dim: sketch-path batch latency at B and final top-10
agreement vs the exact pages path on the same (zipf, bench.py-style) queries.

Usage: N_DOCS=1000000 BATCH=2048 python tools/bench_sketch_dim.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n = int(os.environ.get("N_DOCS", 1_000_000))
    batch = int(os.environ.get("BATCH", 2048))
    dims = tuple(int(x) for x in os.environ.get("DIMS", "1024,512,256").split(","))
    mult = float(os.environ.get("RESCORE_MULT", "4"))
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from radiant_rag_tpu.index.bm25 import BM25Index

    rng = np.random.default_rng(42)
    # bench.py's corpus construction: zipf term ids, 48 tokens/doc
    zipf = rng.zipf(1.3, size=(n, 48)) % 30_000
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]
    qidx = rng.integers(0, n, batch)
    queries = [" ".join(texts[i].split()[:6]) for i in qidx]
    n_oracle = 256

    def host_bm25_topk(bm25, qs, k=10):
        """TRUE BM25 top-k on host via the finalized CSR — no posting-budget
        truncation (the pages path caps postings per query, so on common-term
        corpora it is itself an approximation and unusable as truth)."""
        tids_arr = bm25.query_tids(qs)
        dl = np.zeros(n, np.float32)
        for row, ln in bm25.doc_lens.items():
            dl[row] = ln
        norm = bm25.k1 * (1 - bm25.b + bm25.b * dl / max(bm25.avgdl, 1e-6))
        out = np.full((len(qs), k), -1, np.int64)
        out_s = np.zeros((len(qs), k), np.float32)
        for qi_, tids in enumerate(tids_arr):
            scores = np.zeros(n, np.float32)
            for tid in {int(x) for x in tids if x >= 0}:
                s, e = bm25._term_start[tid], bm25._term_start[tid + 1]
                rows_ = bm25._host_post_rows[s:e]
                tf = bm25._host_post_tf[s:e]
                scores[rows_] += (bm25._term_idf[tid] * tf * (bm25.k1 + 1)
                                  / (tf + norm[rows_]))
            top = np.argpartition(-scores, k)[:k]
            out[qi_] = top[np.argsort(-scores[top], kind="stable")]
            out_s[qi_] = scores[out[qi_]]
        return out, out_s

    results = {}
    oracle = None
    for s_dim in dims:
        bm25 = BM25Index(sketch_dim=s_dim)
        t0 = time.perf_counter()
        bm25.bulk_build(list(range(n)), texts)
        bm25._finalize_csr()
        bm25.ensure_sketch(n)
        bm25.ensure_doc_major(n)
        build = time.perf_counter() - t0
        if oracle is None:  # true host BM25, dim-independent
            t0o = time.perf_counter()
            oracle, oracle_s = host_bm25_topk(bm25, queries[:n_oracle])
            print(f"host oracle: {time.perf_counter() - t0o:.1f}s", flush=True)
        bm25.search_rows_batch(queries, 10, num_rows=n, method="sketch",
                               rescore_multiplier=mult)  # warm
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            sk_s, rows = bm25.search_rows_batch(queries, 10, num_rows=n,
                                                method="sketch",
                                                rescore_multiplier=mult)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1000
        rows = np.asarray(rows)
        sk_s = np.asarray(sk_s)
        agree = float(np.mean([
            len(set(rows[i][rows[i] >= 0]) & set(oracle[i][oracle[i] >= 0]))
            / max(1, (oracle[i] >= 0).sum())
            for i in range(n_oracle)]))
        # score regret distinguishes near-tie id-churn from real quality loss:
        # the sketch path rescores candidates with exact BM25, so its returned
        # top-10 scores are comparable to the oracle's true top-10 scores
        valid = rows[:n_oracle] >= 0
        got = float(np.where(valid, sk_s[:n_oracle], 0.0).sum() / valid.sum())
        want = float(oracle_s.mean())
        results[s_dim] = (med, batch / (med / 1000), agree, build)
        print(f"sketch_dim={s_dim:5d}: {med:7.1f} ms/batch "
              f"({batch / (med / 1000):7.0f} QPS)  top10-agreement={agree:.4f}"
              f"  mean-top10-score={got:.4f} (true {want:.4f}, "
              f"regret {100 * (want - got) / max(want, 1e-9):.2f}%)"
              f"  build={build:.0f}s", flush=True)


if __name__ == "__main__":
    main()
