"""Study: int8 stage-1 scale granularity vs candidate recall.

The production stage-1 (`ops/similarity.int8_scan_topk`) folds the per-dim
dequant scale into the query and symmetric-quantizes the folded query with
ONE scale per query. ROADMAP item: does finer granularity (per-block query
scales) buy recall for extreme calibration ranges?

Schemes compared (numpy, CPU), all against the fp32 exact oracle:
  A  per-query symmetric folded scale (production)
  B  per-block folded scales (block = 32/64/128 dims; block-wise int8
     matmuls summed with per-block dequant)
  C  fp32 query x int8 corpus (granularity upper bound: no query quant loss)

Recall is measured where it matters: does the true top-k survive inside the
stage-1 candidate set of size k*mult (the rescore fixes ordering)?

Run: python tools/study_int8_scales.py  (CPU; env N_ROWS, default 200k)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def quantize_corpus(vecs, lo, hi):
    s = (hi - lo) / 255.0
    q = np.round((vecs - lo) / s) - 128.0
    return np.clip(q, -128, 127).astype(np.int8), s, lo + 128.0 * s


def candidates(scores, kc):
    return np.argpartition(-scores, kc, axis=1)[:, :kc]


def recall(cand, oracle_topk):
    hits = 0
    for i in range(cand.shape[0]):
        hits += len(set(cand[i]) & set(oracle_topk[i]))
    return hits / oracle_topk.size


def main() -> None:
    n = int(os.environ.get("N_ROWS", 200_000))
    dim, b, k = 384, 64, 10
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((256, dim)).astype(np.float32)
    vecs = centers[rng.integers(0, 256, n)] + \
        0.7 * rng.standard_normal((n, dim)).astype(np.float32)
    # adversarial twist: a few dims get extreme ranges (what per-dim
    # calibration + one folded query scale handles worst)
    vecs[:, :8] *= 25.0
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = vecs[rng.integers(0, n, b)] + \
        0.25 * rng.standard_normal((b, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    lo, hi = vecs.min(axis=0), vecs.max(axis=0)
    codes, scale, offset = quantize_corpus(vecs, lo, hi)
    oracle = np.argpartition(-(q @ vecs.T), k, axis=1)[:, :k]
    codes_f = codes.astype(np.float32)

    print(f"n={n} dim={dim} b={b} k={k} (8 dims x25 range)", flush=True)
    print(f"{'scheme':28s} " + " ".join(f"mult={m}" for m in (1, 2, 4)))

    def report(name, scores):
        row = []
        for mult in (1, 2, 4):
            row.append(f"{recall(candidates(scores, k * mult), oracle):６.3f}"
                       .replace("６", "6"))
        print(f"{name:28s} " + "  ".join(f"{r:>6s}" for r in row), flush=True)

    # A: production — one symmetric scale per folded query
    qs = q * scale[None, :]
    sq = np.abs(qs).max(axis=1, keepdims=True) / 127.0
    qi = np.clip(np.round(qs / sq), -127, 127)
    report("A per-query folded (prod)", qi @ codes_f.T * sq + (q @ offset)[:, None])

    # B: per-block folded scales
    for block in (128, 64, 32):
        nb = dim // block
        qb = qs.reshape(b, nb, block)
        sb = np.abs(qb).max(axis=2, keepdims=True) / 127.0 + 1e-12
        qib = np.clip(np.round(qb / sb), -127, 127)
        cb = codes_f.T.reshape(nb, block, n)
        acc = np.zeros((b, n), np.float32)
        for j in range(nb):
            acc += (qib[:, j, :] @ cb[j]) * sb[:, j]
        report(f"B per-block folded ({block}d)", acc + (q @ offset)[:, None])

    # C: fp32 query (no query quantization at all)
    report("C fp32 query x int8 corpus",
           qs @ codes_f.T + (q @ offset)[:, None])


if __name__ == "__main__":
    main()
