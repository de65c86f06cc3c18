#!/usr/bin/env python
"""Chip cost of the BM25 pages program vs the sketch program at 1M docs.

The round-4 router study left ONE open question (BENCH_NOTES "router
fidelity at 1M"): routing picks a single device program per batch, so
coalesced mixed batches stay on the sketch even when many of their
queries would individually route to the exact pages path. Whether that
is the right default depends on the pages program's actual chip cost at
1M — asserted (~10x, from the 20k study) but never measured here. This
times both programs on the real chip:

  corpus   1M zipf docs, vocab 125k (the router study's corpus family —
           `tools/study_router_1m.py`)
  families common (worst-case posting volume for pages: six top-50-df
           terms exhaust the impact-ordered budget), mixed (six words
           from a real doc — the coalescing-relevant traffic), rare
           (six df<=32 words — the traffic auto ALWAYS sends to pages)
  batches  1 / 32 / 256 / 2048 per family x method
  measure  wall ms/batch after per-shape warmup, decomposed into the
           host page-table build (make_pages — per-batch host work the
           sketch path does not pay) and the device program; QPS; pages
           per batch (the cost driver)

Decision this feeds: if pages-at-batch lands within ~2x of the sketch,
coalesced mixed batches should force pages (exactness for near-free);
at ~10x the sketch default stands and the regret table prices it.

Reference anchor: the reference's BM25 is RediSearch-delegated
(`/root/reference/radiant/storage/redis_store.py`) — it never faces
this tradeoff; on a TPU both legs are device programs and the choice is
a measured one.

Usage: N_DOCS=1000000 python tools/study_pages_cost_1m.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

BATCHES = (1, 32, 256, 2048)
REPS = 3


def main() -> int:
    n = int(os.environ.get("N_DOCS", 1_000_000))
    k = 10
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from radiant_rag_tpu.index.bm25 import BM25Index

    rng = np.random.default_rng(42)
    vocab_size = max(30_000, n // 8)
    zipf = rng.zipf(1.3, size=(n, 48)) % vocab_size
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]
    print(f"corpus built ({n} docs)", file=sys.stderr, flush=True)

    bm25 = BM25Index()
    t0 = time.time()
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    print(f"bm25 build: {time.time()-t0:.1f}s ({len(bm25.terms)} terms)",
          file=sys.stderr, flush=True)

    if bm25.sketch_dim <= 0:
        # plan_hbm disabled the sketch tier (bm25.py degrade ladder): every
        # 'sketch' row would silently coerce to the pages program and the
        # study would compare pages against itself. Fail loudly instead.
        sys.exit(f"sketch tier disabled at {n} docs (sketch_dim=0) — "
                 "the sketch-vs-pages comparison is meaningless at this size")

    df = np.asarray(bm25.df)
    order = np.argsort(-df)
    common_terms = [bm25.terms[i] for i in order[:50]]
    rare_tids = [i for i in order[::-1] if 0 < df[i] <= 32][:20_000]
    rare_terms = [bm25.terms[i] for i in rare_tids]
    if not rare_terms:
        sys.exit(f"no df<=32 terms at {n} docs — corpus too small for the "
                 "rare-query family; raise N_DOCS")

    pool = max(BATCHES)
    fams = {
        "common": [" ".join(rng.choice(common_terms, 6)) for _ in range(pool)],
        "mixed": [" ".join(texts[rng.integers(0, n)].split()[:6])
                  for _ in range(pool)],
        "rare": [" ".join(rng.choice(rare_terms, 6)) for _ in range(pool)],
    }

    report = {"docs": n, "vocab": vocab_size, "top_k": k, "reps": REPS,
              "max_postings": bm25.max_postings,
              "sketch_dim": int(bm25.sketch_dim), "rows": []}
    for fam, qs_pool in fams.items():
        for b in BATCHES:
            qs = qs_pool[:b]
            n_pages = int((bm25.make_pages(qs)["len"] > 0).sum())
            for method in ("sketch", "pages"):
                try:
                    # warmup compiles this (method, batch, page-bucket) shape
                    bm25.search_rows_batch(qs, k, method=method)
                    t0 = time.time()
                    for _ in range(REPS):
                        bm25.search_rows_batch(qs, k, method=method)
                except Exception as exc:  # e.g. HBM OOM: the (B, N) f32
                    # scatter buffer alone is 8.6 GB at b=2048 x 1M — a
                    # result in itself; record it and keep measuring
                    row = {"family": fam, "batch": b, "method": method,
                           "error": f"{type(exc).__name__}",
                           "pages_per_batch": n_pages if method == "pages" else 0}
                    report["rows"].append(row)
                    print(json.dumps(row), file=sys.stderr, flush=True)
                    continue
                ms = (time.time() - t0) / REPS * 1e3
                # host-side page-table cost alone (pages pays it per batch)
                t0 = time.time()
                if method == "pages":
                    for _ in range(REPS):
                        bm25.make_pages(qs)
                host_ms = (time.time() - t0) / REPS * 1e3 if method == "pages" else 0.0
                row = {"family": fam, "batch": b, "method": method,
                       "ms_per_batch": round(ms, 2),
                       "host_pages_ms": round(host_ms, 2),
                       "qps": round(b / (ms / 1e3), 1),
                       "pages_per_batch": n_pages if method == "pages" else 0}
                report["rows"].append(row)
                print(json.dumps(row), file=sys.stderr, flush=True)

    out = pathlib.Path(os.environ.get("OUT", "data/pages_cost_1m.json"))
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
