#!/usr/bin/env python
"""BM25 method=auto router fidelity at 1M docs (VERDICT r3 weak #5).

The sketch's stage-1 candidate-set failure on common-term queries is well
characterized at 20k docs (BENCH_NOTES "sketch stage-1 fidelity"); this
measures the router's actual false-route rate at the 1M scale, where the
collision-doc population is ~50x larger:

  corpus   1M zipfian token docs (bench.py family) -> native BM25 build
  queries  three families sampled from indexed docs:
             common  6 words drawn from the 50 highest-df terms
             mixed   6 words sampled from a real doc (zipf mix)
             rare    6 words from the df<=32 tail
  routing  query_posting_volume vs pages_route_threshold (the product
           signal, `index/bm25.py:585`)
  oracle   method='pages' exhaustive-exact top-k
  measure  for sketch-ROUTED queries: recall@10 vs oracle + relative score
           regret at matched rank, at the shallow (k) and product-depth
           (fused_depth=4k via rescore window 16x) candidate widths

False route := a query the router sends to the sketch whose sketch top-10
misses oracle docs (recall < 1). The fused_depth default widens the exact
rescore window 4x, which is the measured repair for collision misses (the
round-4 "product-depth refresh" note) — this study quantifies it on the
router's own traffic at 1M.

Usage: N_DOCS=1000000 python tools/study_router_1m.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    n = int(os.environ.get("N_DOCS", 1_000_000))
    n_q = int(os.environ.get("N_QUERIES", 256))
    k = 10
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from radiant_rag_tpu.index.bm25 import BM25Index

    rng = np.random.default_rng(42)
    # vocab grows with the corpus (Heaps' law in real text): a fixed 30k
    # vocab saturates at ~1M docs x 48 tokens (min df >> 32 — no rare tail
    # exists at all, which is itself unrealistic for text)
    vocab_size = max(30_000, n // 8)
    zipf = rng.zipf(1.3, size=(n, 48)) % vocab_size
    texts = [" ".join(f"w{t}" for t in row) for row in zipf]
    print(f"corpus built ({n} docs)", file=sys.stderr, flush=True)

    bm25 = BM25Index()
    t0 = time.time()
    bm25.bulk_build(list(range(n)), texts)
    bm25._finalize_csr()
    print(f"bm25 build: {time.time()-t0:.1f}s "
          f"({len(bm25.terms)} terms)", file=sys.stderr, flush=True)

    df = np.asarray(bm25.df)
    order = np.argsort(-df)
    common_terms = [bm25.terms[i] for i in order[:50]]
    rare_tids = [i for i in order[::-1] if 0 < df[i] <= 32][:20_000]
    if not rare_tids:  # saturated vocab: lowest-df tail regardless of cutoff
        rare_tids = [i for i in order[::-1] if df[i] > 0][:20_000]
    rare_terms = [bm25.terms[i] for i in rare_tids]

    fams = {}
    fams["common"] = [" ".join(rng.choice(common_terms, 6)) for _ in range(n_q)]
    fams["mixed"] = [" ".join(texts[rng.integers(0, n)].split()[:6])
                     for _ in range(n_q)]
    fams["rare"] = [" ".join(rng.choice(rare_terms, 6)) for _ in range(n_q)]
    # the router's actual risk family: posting volume ABOVE the threshold
    # (5 common terms force the sketch route) but relevance carried by one
    # rare high-idf term — the regime the round-3 fidelity study flagged
    # (a rare term's small bin signal drowning in collisions) and the one
    # signed hashing is supposed to repair
    fams["disc_at_volume"] = [
        " ".join(list(rng.choice(common_terms, 5)) + [str(rng.choice(rare_terms))])
        for _ in range(n_q)]

    report = {"docs": n, "queries_per_family": n_q,
              "pages_route_threshold": bm25.pages_route_threshold,
              "families": {}}
    for fam, qs in fams.items():
        vols = np.asarray([bm25.query_posting_volume([q]) for q in qs])
        # the PRODUCT routing signal, per query (b=1 batches): pages when
        # volume is small OR the query has a discriminative term
        routed_sketch = np.asarray([not bm25.routes_pages([q]) for q in qs])
        t0 = time.time()
        # top-50 oracle in one call: top-10 plus the tie-aware membership
        # window (synthetic zipf text at 1M is tie-dense — exact-top-10
        # identity is ill-defined among equal scores; cf. the round-3 graph
        # study's in-oracle50 metric)
        o_s50, o_i50 = bm25.search_rows_batch(qs, 50, method="pages")
        o_s, o_i = o_s50[:, :k], o_i50[:, :k]
        t_pages = time.time() - t0
        res = {}
        for label, mult in (("shallow_4x", 4.0), ("product_16x", 16.0)):
            t0 = time.time()
            s_s, s_i = bm25.search_rows_batch(qs, k, method="sketch",
                                              rescore_multiplier=mult)
            t_sketch = time.time() - t0
            recalls, regrets, in50, regrets10 = [], [], [], []
            routed_flags, routed_regrets10 = [], []
            for qi in range(len(qs)):
                oracle = [r for r in o_i[qi] if r >= 0]
                if not oracle:
                    continue
                routed_flags.append(bool(routed_sketch[qi]))
                got = [r for r in s_i[qi] if r >= 0]
                recalls.append(len(set(got) & set(oracle)) / len(oracle))
                in50.append(len(set(got) & set(r for r in o_i50[qi] if r >= 0))
                            / max(1, len(got)))
                om = float(np.max(o_s[qi]))
                if om > 0:
                    # score regret: oracle top-1 score vs sketch top-1
                    regrets.append(max(0.0, (om - float(np.max(s_s[qi]))) / om))
                    # tie-aware: mean exact score of the RETURNED top-10
                    # (stage-2 rescore is exact BM25) vs the oracle's —
                    # equal-score different docs cost nothing here
                    o10 = float(np.mean(o_s[qi][o_s[qi] > -1e29]))
                    s10 = float(np.mean(s_s[qi][:k][s_s[qi][:k] > -1e29])) \
                        if (s_s[qi][:k] > -1e29).any() else 0.0
                    r10 = max(0.0, (o10 - s10) / max(o10, 1e-9))
                    regrets10.append(r10)
                    if routed_sketch[qi]:
                        routed_regrets10.append(r10)
            recalls = np.asarray(recalls)
            routed_flags = np.asarray(routed_flags, bool)
            sk = recalls[routed_flags] if routed_flags.any() else np.asarray([])
            res[label] = {
                "recall@10_vs_exact_mean": round(float(recalls.mean()), 4),
                "in_oracle50_mean": round(float(np.mean(in50)), 4),
                "mean_top10_score_regret": round(float(np.mean(regrets10)), 4)
                if regrets10 else 0.0,
                "sketch_routed_recall_mean": (round(float(sk.mean()), 4)
                                              if sk.size else None),
                "sketch_routed_regret10_mean": (
                    round(float(np.mean(routed_regrets10)), 4)
                    if routed_regrets10 else None),
                "false_route_rate": (round(float((sk < 1.0).mean()), 4)
                                     if sk.size else None),
                "false_route_rate_lt0.9": (round(float((sk < 0.9).mean()), 4)
                                           if sk.size else None),
                "top1_score_regret_mean": round(float(np.mean(regrets)), 4)
                if regrets else 0.0,
                "sketch_batch_s": round(t_sketch, 2),
            }
        report["families"][fam] = {
            "posting_volume_median": int(np.median(vols)),
            "sketch_routed_fraction": round(float(routed_sketch.mean()), 3),
            "pages_batch_s": round(t_pages, 2),
            **res,
        }
        print(f"{fam}: {json.dumps(report['families'][fam])}",
              file=sys.stderr, flush=True)

    out = os.environ.get("OUT", "data/router_study_1m.json")
    pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
