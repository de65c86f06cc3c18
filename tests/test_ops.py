"""Device-op correctness vs brute-force numpy oracles.

This is the recall/correctness harness the reference lacks (SURVEY.md §4:
"vector retrieval itself is never tested" there).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radiant_rag_tpu.ops.quantize import (
    pack_binary, quantize_int8, dequantize_int8, calibrate_int8_ranges,
    int8_scale_offset, packed_words,
)
from radiant_rag_tpu.ops.similarity import (
    exact_topk, hamming_scan_topk, int8_scan_topk, two_stage_topk,
)
from radiant_rag_tpu.ops.fusion import rrf_fuse
from radiant_rag_tpu.ops.bm25 import bm25_score_topk


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


# ---------------------------------------------------------------- quantize --
def test_pack_binary_matches_numpy_oracle(rng):
    x = rng.standard_normal((17, 64)).astype(np.float32)
    packed = np.asarray(pack_binary(jnp.asarray(x)))
    assert packed.shape == (17, 2)
    bits = (x > 0).astype(np.uint32)
    for w in range(2):
        expect = sum(bits[:, w * 32 + i] << np.uint32(i) for i in range(32))
        np.testing.assert_array_equal(packed[:, w], expect)


def test_packed_words():
    assert packed_words(384) == 12
    assert packed_words(33) == 2


def test_int8_roundtrip_error_small(rng):
    x = _normed(rng, 200, 96)
    lo, hi = calibrate_int8_ranges(jnp.asarray(x))
    q = quantize_int8(jnp.asarray(x), lo, hi)
    back = np.asarray(dequantize_int8(q, lo, hi))
    # quantization step is (hi-lo)/255; max error ~ half a step
    step = (np.asarray(hi) - np.asarray(lo)) / 255.0
    assert np.all(np.abs(back - x) <= step * 0.75 + 1e-6)


def test_int8_scale_offset_identity(rng):
    x = _normed(rng, 50, 32)
    lo, hi = calibrate_int8_ranges(jnp.asarray(x))
    q = quantize_int8(jnp.asarray(x), lo, hi)
    s, o = int8_scale_offset(lo, hi)
    manual = np.asarray(q, np.float32) * np.asarray(s) + np.asarray(o)
    np.testing.assert_allclose(manual, np.asarray(dequantize_int8(q, lo, hi)), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------- exact ----
def test_exact_topk_matches_oracle(rng):
    corpus = _normed(rng, 300, 64)
    queries = _normed(rng, 5, 64)
    s, i = exact_topk(jnp.asarray(corpus), jnp.asarray(queries), None, 10)
    s, i = np.asarray(s), np.asarray(i)
    oracle = queries @ corpus.T
    for qi in range(5):
        expect = set(np.argsort(-oracle[qi])[:10])
        assert set(i[qi]) == expect
        np.testing.assert_allclose(np.sort(s[qi]), np.sort(oracle[qi][list(expect)]), rtol=1e-4)


def test_exact_topk_mask(rng):
    corpus = _normed(rng, 100, 32)
    queries = _normed(rng, 2, 32)
    mask = np.zeros(100, bool)
    mask[:7] = True
    s, i = exact_topk(jnp.asarray(corpus), jnp.asarray(queries), jnp.asarray(mask), 10)
    i = np.asarray(i)
    valid = np.asarray(s) > -1e29
    assert valid.sum(axis=1).tolist() == [7, 7]
    assert np.all(i[valid] < 7)


# ---------------------------------------------------------------- hamming --
def test_hamming_scan_matches_popcount_oracle(rng):
    corpus = _normed(rng, 256, 64)
    queries = _normed(rng, 3, 64)
    codes = pack_binary(jnp.asarray(corpus))
    qcodes = pack_binary(jnp.asarray(queries))
    s, i = hamming_scan_topk(codes, qcodes, None, 20)
    s, i = np.asarray(s), np.asarray(i)
    cb = (corpus > 0)
    qb = (queries > 0)
    for qi in range(3):
        ham = (cb != qb[qi]).sum(axis=1)
        oracle_scores = (64 - 2 * ham) / 64.0
        # scores of returned docs must match the oracle
        np.testing.assert_allclose(s[qi], oracle_scores[i[qi]], rtol=1e-6)
        # and the returned set must be a valid top-20 by hamming
        kth = np.sort(oracle_scores)[::-1][19]
        assert np.all(oracle_scores[i[qi]] >= kth - 1e-9)


def test_int8_scan_close_to_exact(rng):
    corpus = _normed(rng, 400, 128)
    queries = _normed(rng, 4, 128)
    lo, hi = calibrate_int8_ranges(jnp.asarray(corpus))
    codes = quantize_int8(jnp.asarray(corpus), lo, hi)
    s, o = int8_scale_offset(lo, hi)
    scores, idx = int8_scan_topk(codes, jnp.asarray(queries), s, o, None, 10)
    scores, idx = np.asarray(scores), np.asarray(idx)
    oracle = queries @ corpus.T
    for qi in range(4):
        top_true = set(np.argsort(-oracle[qi])[:20])
        overlap = len(set(idx[qi]) & top_true)
        assert overlap >= 8  # int8 stage-1 keeps nearly all true top-10 in top-20
        np.testing.assert_allclose(scores[qi], oracle[qi][idx[qi]], atol=0.05)


def test_two_stage_recall_near_perfect(rng):
    # Planted-neighbor corpus: each query has 10 true neighbors (query + small
    # noise) among 1000 distractors — the structure real embedding corpora
    # have. (On pure random gaussian data all similarities are ~0 and sign
    # sketches can't separate ties; that is not the retrieval regime.)
    d = 128
    queries = _normed(rng, 8, d)
    planted = []
    for qi in range(8):
        planted.append(_normed(rng, 10, d) * 0.5 + queries[qi] * 1.0)
    corpus = np.concatenate([_normed(rng, 920, d)] + planted, axis=0)
    corpus = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    codes = pack_binary(jnp.asarray(corpus))
    qcodes = pack_binary(jnp.asarray(queries))
    s, i = two_stage_topk(
        jnp.asarray(corpus), jnp.asarray(queries), None, 10, 40, "hamming",
        binary_codes=codes, qbinary=qcodes,
    )
    s, i = np.asarray(s), np.asarray(i)
    oracle = queries @ corpus.T
    recalls = []
    for qi in range(8):
        true10 = set(np.argsort(-oracle[qi])[:10])
        recalls.append(len(set(i[qi]) & true10) / 10.0)
        # rescored scores are exact fp32 similarities
        np.testing.assert_allclose(s[qi], oracle[qi][i[qi]], rtol=1e-4)
    assert np.mean(recalls) >= 0.9


# ---------------------------------------------------------------- fusion ---
def test_rrf_matches_reference_formula():
    # run1: docs [3,1,2]; run2: docs [1,4,-1(pad)]
    r1 = jnp.asarray([[3, 1, 2]], jnp.int32)
    r2 = jnp.asarray([[1, 4, -1]], jnp.int32)
    s, rows = rrf_fuse((r1, r2), k=4, rrf_k=60)
    s, rows = np.asarray(s)[0], np.asarray(rows)[0]
    expect = {
        3: 1 / 61,
        1: 1 / 62 + 1 / 61,
        2: 1 / 63,
        4: 1 / 62,
    }
    got = {int(r): float(v) for r, v in zip(rows, s) if r >= 0}
    assert set(got) == set(expect)
    for doc, sc in expect.items():
        np.testing.assert_allclose(got[doc], sc, rtol=1e-6)
    # doc 1 appears in both runs and must rank first
    assert rows[0] == 1


def test_rrf_dedup_within_run():
    r1 = jnp.asarray([[5, 5, 2]], jnp.int32)
    s, rows = rrf_fuse((r1,), k=3, rrf_k=60)
    rows = np.asarray(rows)[0]
    assert list(rows).count(5) == 1


def test_score_fuse_matches_numpy_oracle():
    from radiant_rag_tpu.ops.fusion import score_fuse

    rng = np.random.default_rng(3)
    b, kr = 4, 5
    r1 = rng.choice(50, size=(b, kr), replace=False).astype(np.int32)
    r2 = rng.choice(50, size=(b, kr), replace=False).astype(np.int32)
    s1 = np.sort(rng.normal(size=(b, kr)).astype(np.float32))[:, ::-1].copy()
    s2 = np.sort(rng.normal(size=(b, kr)).astype(np.float32))[:, ::-1].copy()
    r2[0, -1] = -1  # pad entry must not contribute
    w = np.asarray([[0.3, 0.7]] * b, np.float32)
    s, rows = score_fuse((jnp.asarray(r1), jnp.asarray(r2)),
                         (jnp.asarray(s1), jnp.asarray(s2)),
                         jnp.asarray(w), k=6)
    s, rows = np.asarray(s), np.asarray(rows)

    for qi in range(b):
        expect = {}
        for wi, (ids, sc) in enumerate(((r1, s1), (r2, s2))):
            live = ids[qi] >= 0
            vals = sc[qi][live]
            mu, sd = vals.mean(), np.sqrt(((vals - vals.mean()) ** 2).mean())
            z = (vals - mu) / sd
            z = z - z.min() + 0.05  # shifted floor: retrieved > not-retrieved
            for r, v in zip(ids[qi][live], z):
                expect[int(r)] = expect.get(int(r), 0.0) + w[qi, wi] * v
        top = sorted(expect, key=expect.get, reverse=True)[:6]
        got = [int(r) for r in rows[qi] if r >= 0]
        assert got == top
        for r, v in zip(got, s[qi]):
            np.testing.assert_allclose(v, expect[r], rtol=2e-3, atol=2e-3)


def test_score_fuse_absence_is_not_negative_evidence():
    from radiant_rag_tpu.ops.fusion import score_fuse

    # strong leg ranks doc 7 first; weak leg does not contain doc 7 at all.
    # doc 7 must still win: absence from the weak run contributes 0, and the
    # weak leg's own confident head (doc 9, small weight) must not displace it.
    r_strong = jnp.asarray([[7, 3, 4]], jnp.int32)
    s_strong = jnp.asarray([[0.9, 0.2, 0.1]], jnp.float32)
    r_weak = jnp.asarray([[9, 5, 6]], jnp.int32)
    s_weak = jnp.asarray([[0.8, 0.3, 0.2]], jnp.float32)
    w = jnp.asarray([[0.9, 0.1]], jnp.float32)
    _s, rows = score_fuse((r_strong, r_weak), (s_strong, s_weak), w, k=4)
    assert int(np.asarray(rows)[0, 0]) == 7


# ---------------------------------------------------------------- bm25 -----
def _bm25_oracle(doc_tokens, query_terms, k1=1.5, b=0.75):
    import math

    n = len(doc_tokens)
    avgdl = sum(len(t) for t in doc_tokens) / n
    scores = np.zeros(n)
    for term in query_terms:
        df = sum(1 for t in doc_tokens if term in t)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        for d, toks in enumerate(doc_tokens):
            tf = toks.count(term)
            if tf:
                denom = tf + k1 * (1 - b + b * len(toks) / avgdl)
                scores[d] += idf * tf * (k1 + 1) / denom
    return scores


def test_bm25_device_op_matches_oracle():
    docs = [
        "the quick brown fox jumps".split(),
        "the lazy dog sleeps all day the the".split(),
        "quick quick brown dogs".split(),
        "unrelated words entirely here".split(),
    ]
    query = ["quick", "dog"]
    oracle = _bm25_oracle(docs, query)

    # build postings by hand in the op's format
    import math

    n = len(docs)
    avgdl = sum(len(t) for t in docs) / n
    rows_l, tfs_l, idfs_l = [], [], []
    for term in query:
        df = sum(1 for t in docs if term in t)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        for d, toks in enumerate(docs):
            tf = toks.count(term)
            if tf:
                rows_l.append(d)
                tfs_l.append(tf)
                idfs_l.append(idf)
    P = 8
    rows = np.full((1, P), -1, np.int32)
    tfs = np.zeros((1, P), np.float32)
    idfs = np.zeros((1, P), np.float32)
    rows[0, : len(rows_l)] = rows_l
    tfs[0, : len(tfs_l)] = tfs_l
    idfs[0, : len(idfs_l)] = idfs_l
    doc_lens = np.zeros(8, np.float32)
    doc_lens[:n] = [len(t) for t in docs]

    s, i = bm25_score_topk(
        jnp.asarray(rows), jnp.asarray(tfs), jnp.asarray(idfs),
        jnp.asarray(doc_lens), jnp.asarray(avgdl, jnp.float32),
        None, 4, 8,
    )
    s, i = np.asarray(s)[0], np.asarray(i)[0]
    order = np.argsort(-oracle)
    hits = [(r, v) for r, v in zip(i, s) if r >= 0 and v > 0]
    assert [r for r, _ in hits] == [d for d in order if oracle[d] > 0][: len(hits)]
    for r, v in hits:
        np.testing.assert_allclose(v, oracle[r], rtol=1e-4)


def test_select_policies_agree_int8(rng):
    """f32 / bf16 / bf16_chunked stage-1 selection pick (nearly) the same
    candidates; the f32 path is the exact-ordering oracle (bf16 rounding may
    swap near-ties, absorbed downstream by the rescore multiplier)."""
    corpus = _normed(rng, 3000, 128)  # odd size: exercises chunk padding
    queries = _normed(rng, 4, 128)
    lo, hi = calibrate_int8_ranges(jnp.asarray(corpus))
    codes = quantize_int8(jnp.asarray(corpus), lo, hi)
    s, o = int8_scale_offset(lo, hi)
    mask = np.ones(3000, bool)
    mask[5] = False  # masked rows must never surface
    outs = {}
    for sel in ("f32", "bf16", "bf16_chunked"):
        sc, ix = int8_scan_topk(codes, jnp.asarray(queries), s, o,
                                jnp.asarray(mask), 20, sel)
        outs[sel] = (np.asarray(sc), np.asarray(ix))
        assert 5 not in set(np.asarray(ix).ravel().tolist())
    ref_s, ref_i = outs["f32"]
    for sel in ("bf16", "bf16_chunked"):
        sc, ix = outs[sel]
        for qi in range(4):
            overlap = len(set(ix[qi]) & set(ref_i[qi])) / 20.0
            assert overlap >= 0.9, (sel, qi, overlap)
            # dequantized scores of shared rows match the f32 path closely
            shared = sorted(set(ix[qi]) & set(ref_i[qi]))
            a = {r: v for r, v in zip(ix[qi], sc[qi])}
            b = {r: v for r, v in zip(ref_i[qi], ref_s[qi])}
            for r in shared:
                assert abs(a[r] - b[r]) < 0.02, (sel, r, a[r], b[r])


def test_select_policies_agree_hamming(rng):
    corpus = _normed(rng, 2500, 128)
    queries = _normed(rng, 3, 128)
    codes = pack_binary(jnp.asarray(corpus))
    qcodes = pack_binary(jnp.asarray(queries))
    ref_s, ref_i = map(np.asarray, hamming_scan_topk(codes, qcodes, None, 15, "f32"))
    for sel in ("bf16", "bf16_chunked"):
        sc, ix = map(np.asarray, hamming_scan_topk(codes, qcodes, None, 15, sel))
        for qi in range(3):
            # hamming raw scores are small ints: bf16 is exact, so the
            # selected SCORE multiset must match exactly (ties may reorder)
            np.testing.assert_allclose(np.sort(sc[qi]), np.sort(ref_s[qi]), rtol=1e-6)


def test_two_stage_chunked_matches_monolithic(rng):
    corpus = _normed(rng, 1500, 64)
    queries = _normed(rng, 4, 64)
    lo, hi = calibrate_int8_ranges(jnp.asarray(corpus))
    codes = quantize_int8(jnp.asarray(corpus), lo, hi)
    s, o = int8_scale_offset(lo, hi)
    res = {}
    for sel in ("f32", "bf16", "bf16_chunked"):
        ts, ti = two_stage_topk(jnp.asarray(corpus), jnp.asarray(queries), None,
                                10, 40, "int8", int8_codes=codes, int8_scale=s,
                                int8_offset=o, select=sel)
        res[sel] = (np.asarray(ts), np.asarray(ti))
    # after fp32 rescore over a 4x candidate pool, all policies agree exactly
    # on this well-separated corpus
    for sel in ("bf16", "bf16_chunked"):
        np.testing.assert_allclose(res[sel][0], res["f32"][0], rtol=1e-5)
