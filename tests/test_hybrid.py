"""Fused hybrid retrieval tests: one device program for dense+BM25+RRF."""

import numpy as np
import pytest

from radiant_rag_tpu.config import IndexConfig
from radiant_rag_tpu.index.bm25 import BM25Index
from radiant_rag_tpu.index.engine import DeviceVectorIndex
from radiant_rag_tpu.index.hybrid import HybridSearcher

TEXT_POOL = [
    "alpha bravo charlie delta", "bravo charlie echo", "delta echo foxtrot golf",
    "golf hotel india juliet", "kilo lima mike november", "oscar papa quebec",
    "romeo sierra tango", "uniform victor whiskey", "xray yankee zulu alpha",
    "november oscar bravo charlie delta echo",
]


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(7)
    n, d = 120, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    texts = [TEXT_POOL[i % len(TEXT_POOL)] + f" doc{i}" for i in range(n)]
    engine = DeviceVectorIndex(d, initial_capacity=256)
    engine.append(vecs, np.zeros(n, np.int8), np.zeros(n, np.int32),
                  np.asarray([len(t.split()) for t in texts], np.float32))
    bm25 = BM25Index(sketch_dim=512)
    for row, t in enumerate(texts):
        bm25.add_document(row, t)
    return vecs, texts, HybridSearcher(engine, bm25)


def test_hybrid_shapes(setup):
    vecs, texts, searcher = setup
    q = vecs[:3]
    res = searcher.search_rows(q, ["alpha bravo doc1", "echo foxtrot", "zulu"],
                               dense_k=5, bm25_k=5, fused_k=8)
    assert set(res) == {"dense", "bm25", "fused"}
    for name, k in (("dense", 5), ("bm25", 5), ("fused", 8)):
        s, r = res[name]
        assert s.shape == (3, k) and r.shape == (3, k)


def test_hybrid_dense_matches_engine(setup):
    vecs, texts, searcher = setup
    q = vecs[10:13] + 0.01
    res = searcher.search_rows(q / np.linalg.norm(q, axis=1, keepdims=True),
                               ["alpha"] * 3, dense_k=5)
    s_direct, r_direct = searcher.engine.search(
        q / np.linalg.norm(q, axis=1, keepdims=True), 5, mode="binary")
    np.testing.assert_array_equal(res["dense"][1], r_direct)


@pytest.mark.parametrize("bm25_mode", ["pages", "sketch"])
def test_hybrid_bm25_finds_term_matches(setup, bm25_mode):
    vecs, texts, searcher = setup
    rng = np.random.default_rng(3)
    q = rng.standard_normal((1, 64)).astype(np.float32)
    res = searcher.search_rows(q, ["kilo lima mike"], bm25_k=5, bm25_mode=bm25_mode)
    s, r = res["bm25"]
    hits = [int(x) for x in r[0] if x >= 0]
    assert hits, f"no bm25 hits in mode {bm25_mode}"
    for row in hits:
        assert any(w in texts[row] for w in ("kilo", "lima", "mike"))


def test_sketch_ranking_close_to_exact(setup):
    vecs, texts, searcher = setup
    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, 64)).astype(np.float32)
    queries = ["alpha bravo charlie", "echo foxtrot golf hotel"]
    exact = searcher.search_rows(q, queries, bm25_k=8, bm25_mode="pages")["bm25"]
    sketch = searcher.search_rows(q, queries, bm25_k=8, bm25_mode="sketch")["bm25"]
    for qi in range(2):
        e = [x for x in exact[1][qi] if x >= 0]
        s = [x for x in sketch[1][qi] if x >= 0]
        # hash-collision noise may reorder but the sets should mostly agree
        overlap = len(set(e) & set(s)) / max(len(e), 1)
        assert overlap >= 0.7, (e, s)


def test_hybrid_fused_contains_both_signals(setup):
    vecs, texts, searcher = setup
    # query dense-similar to row 42, textually matching row 4's words
    q = vecs[42:43]
    res = searcher.search_rows(q, ["kilo lima mike november"], dense_k=5, bm25_k=5, fused_k=10)
    fused_rows = set(int(x) for x in res["fused"][1][0] if x >= 0)
    assert 42 in fused_rows  # dense signal
    assert any("kilo" in texts[r] for r in fused_rows)  # sparse signal


def test_hybrid_respects_validity(setup):
    vecs, texts, searcher = setup
    searcher.engine.invalidate(np.asarray([5]))
    try:
        q = vecs[5:6]
        res = searcher.search_rows(q, [texts[5]], dense_k=10, bm25_k=10, fused_k=10)
        for name in ("dense", "bm25", "fused"):
            assert 5 not in set(int(x) for x in res[name][1][0] if x >= 0), name
    finally:
        # restore for other tests (module-scoped fixture)
        import jax.numpy as jnp
        searcher.engine.valid = searcher.engine.valid.at[5].set(True)


def test_sketch_with_exact_rescore_matches_pages(setup):
    """With rescore_multiplier, the sketch leg's returned SCORES are exact
    BM25 (identical to the pages-exact path) for all shared hits."""
    vecs, texts, searcher = setup
    rng = np.random.default_rng(9)
    q = rng.standard_normal((2, 64)).astype(np.float32)
    queries = ["alpha bravo charlie", "kilo lima mike november"]
    exact = searcher.search_rows(q, queries, bm25_k=6, bm25_mode="pages",
                                 rescore_multiplier=8.0)["bm25"]
    sketch = searcher.search_rows(q, queries, bm25_k=6, bm25_mode="sketch",
                                  rescore_multiplier=8.0)["bm25"]
    for qi in range(2):
        es = {int(r): float(s) for s, r in zip(exact[0][qi], exact[1][qi]) if r >= 0}
        ss = {int(r): float(s) for s, r in zip(sketch[0][qi], sketch[1][qi]) if r >= 0}
        shared = set(es) & set(ss)
        assert len(shared) >= max(1, int(0.8 * len(es)))
        for r in shared:
            np.testing.assert_allclose(ss[r], es[r], rtol=1e-4)


def test_calibrated_leg_weights_math():
    from radiant_rag_tpu.ops.fusion import calibrated_leg_weights

    # garbage dense vs good bm25 -> tiebreak mass only (< 1.3% rank-gap line)
    w = calibrated_leg_weights([0.05, 0.72])
    assert w[0] / w[1] < 0.013
    # comparable legs -> near-equal
    w = calibrated_leg_weights([0.65, 0.72])
    assert 0.5 < w[0] / w[1] <= 1.0
    # both dead -> exactly equal (reference behavior)
    w = calibrated_leg_weights([0.0, 0.0])
    assert abs(w[0] - w[1]) < 1e-9
    # symmetric
    w = calibrated_leg_weights([0.72, 0.05])
    assert w[1] / w[0] < 0.013


def test_weighted_rrf_downweights_bad_leg():
    import jax.numpy as jnp

    from radiant_rag_tpu.ops.fusion import rrf_fuse, weighted_rrf_fuse

    # leg A ranks docs 1,2,3; leg B (garbage) ranks 9,8,7
    a = jnp.asarray([[1, 2, 3]], jnp.int32)
    bb = jnp.asarray([[9, 8, 2]], jnp.int32)
    w = jnp.asarray([[0.99, 0.01]], jnp.float32)
    s, rows = weighted_rrf_fuse((a, bb), w, k=4)
    # leg A's order survives intact; garbage leg only appends
    assert rows[0][:3].tolist() == [1, 2, 3]
    # with equal weights doc 2 (ranked by both) jumps doc 1
    s2, rows2 = rrf_fuse((a, bb), k=4)
    assert rows2[0][0].tolist() == 2


def test_searcher_calibration_sets_weights(rng):
    """End-to-end: random embeddings (garbage dense) + real texts (good bm25)
    -> calibration demotes the dense leg and fused order follows bm25."""
    import numpy as np

    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.hybrid import HybridSearcher
    from radiant_rag_tpu.index.store import TpuVectorStore

    texts = [f"unique{i} subject{i % 7} verb{i % 11} object{i}" for i in range(64)]
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=64))
    embs = rng.standard_normal((64, 16)).astype(np.float32)
    store.upsert_batch([(t, {}, embs[i]) for i, t in enumerate(texts)])
    bm25 = BM25Index(sketch_dim=128)
    rows = [store.row_of(store.make_doc_id(t, {})) for t in texts]
    bm25.bulk_build(rows, texts)
    searcher = HybridSearcher(store.engine, bm25)
    assert searcher.needs_calibration()

    def text_of(row):
        doc_id = store.id_for_row(row)
        doc = store.get_doc(doc_id) if doc_id else None
        return doc.content if doc else None

    def embed(qs):  # garbage encoder: random unit vectors
        e = rng.standard_normal((len(qs), 16)).astype(np.float32)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    w = searcher.calibrate_fusion(embed, text_of, n_probes=32)
    assert not searcher.needs_calibration()
    assert w[1] > 0.9 and w[0] < 0.05, w  # bm25 leg dominates
    assert searcher.last_calibration["bm25_mrr"] > 0.5

    # fused results now track the bm25 leg
    q = embed(["probe"])
    res = searcher.search_rows(q, ["unique5 subject5"], dense_k=5, bm25_k=5, fused_k=5)
    assert res["fused"][1][0][0] == res["bm25"][1][0][0]


def test_fetch_false_pipelining_parity(setup):
    """fetch=False returns an in-flight device result + unpack fn whose
    decoded output is identical to the fetched path (the serving/bench
    pipelining seam), including the empty-store and oversized-batch
    fallbacks."""
    vecs, texts, searcher = setup
    qd = vecs[:8] + 0.01
    qd = qd / np.linalg.norm(qd, axis=1, keepdims=True)
    qt = [texts[i] for i in range(8)]
    sync = searcher.search_rows(qd, qt, dense_k=5, bm25_k=5, fused_k=7, mode="int8")
    dev, unpack = searcher.search_rows(qd, qt, dense_k=5, bm25_k=5, fused_k=7,
                                       mode="int8", fetch=False)
    assert dev is not None  # real in-flight device array
    pipe = unpack()
    for name in ("dense", "bm25", "fused"):
        np.testing.assert_allclose(pipe[name][0], sync[name][0], rtol=1e-6)
        np.testing.assert_array_equal(pipe[name][1], sync[name][1])

    # empty engine: graceful host fallback
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.index.hybrid import HybridSearcher

    empty = HybridSearcher(DeviceVectorIndex(64, initial_capacity=256), BM25Index())
    dev0, unpack0 = empty.search_rows(qd, qt, dense_k=3, bm25_k=3, fused_k=3,
                                      mode="int8", fetch=False)
    assert dev0 is None
    res0 = unpack0()
    assert (res0["fused"][1] == -1).all()


def test_query_blob_roundtrip():
    """pack_query_blob <-> _unpack_query_blob is lossless for everything
    except queries (fp16 — exact when the input is fp16-representable)."""
    import jax

    from radiant_rag_tpu.index.hybrid import (_unpack_query_blob,
                                              pack_query_blob)

    rng = np.random.default_rng(3)
    bq, d, t, s = 8, 64, 6, 512
    queries = rng.standard_normal((bq, d)).astype(np.float16).astype(np.float32)
    q_tids = rng.integers(-1, 30_000, (bq, t)).astype(np.int32)
    q_idfs = rng.random((bq, t)).astype(np.float32)
    # signed-bin encoding (make_query_bins): ±(bin+1), 0 = pad
    sign = np.where(q_tids % 2 == 0, 1, -1)
    q_bins = np.where(q_tids >= 0, ((q_tids % s) + 1) * sign, 0).astype(np.int16)
    # duplicate bin inside one query (same sign): multiplicity must survive
    q_bins[0, 1] = q_bins[0, 0] = 8  # bin 7, sign +
    q_tids[0, 0] = 11
    q_tids[0, 1] = 12
    leg_w = np.asarray([0.7, 0.3], np.float32)
    blob = pack_query_blob(queries, q_tids, q_idfs, q_bins, 5, 1, -1, leg_w,
                           s, avgdl=12.5)

    out = jax.jit(_unpack_query_blob, static_argnums=(1, 2, 3, 4))(
        jax.numpy.asarray(blob), bq, d, t, s)
    uq, uqvalid, utids, uidfs, uqind, ulevel, ulang, ulegw, uavgdl = out
    np.testing.assert_array_equal(np.asarray(uq), queries)
    assert np.asarray(uqvalid).tolist() == [True] * 5 + [False] * 3
    np.testing.assert_array_equal(np.asarray(utids), q_tids)
    np.testing.assert_array_equal(np.asarray(uidfs), q_idfs)
    assert int(np.asarray(ulevel)) == 1 and int(np.asarray(ulang)) == -1
    np.testing.assert_allclose(np.asarray(ulegw), leg_w)
    assert float(np.asarray(uavgdl)) == 12.5
    ind = np.asarray(uqind)
    assert ind[0, 7] == 2  # collision multiplicity preserved
    # exact signed-indicator parity: every code adds its sign to its bin
    exp = np.zeros((bq, s), np.int8)
    for qi in range(bq):
        for v in q_bins[qi]:
            if v != 0:
                exp[qi, abs(int(v)) - 1] += 1 if v > 0 else -1
    np.testing.assert_array_equal(ind, exp)


def test_query_blob_wide_sketch_int32_bins():
    """sketch_dim beyond the int16 range switches bins to int32 — bin ids
    above 32767 must survive the round trip (silent int16 wraparound would
    drop query terms from the stage-1 indicator)."""
    import jax

    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.hybrid import (_unpack_query_blob,
                                              pack_query_blob)

    s = 1 << 16
    bm = BM25Index(sketch_dim=s)
    bq, d, t = 2, 8, 4
    queries = np.zeros((bq, d), np.float32)
    q_tids = np.asarray([[1, 2, -1, -1], [3, -1, -1, -1]], np.int32)
    q_idfs = np.ones((bq, t), np.float32)
    # signed-bin codes ±(bin+1), 0 pad: bins 40000 (+), 7 (-), 65535 (+)
    q_bins = np.asarray([[40001, -8, 0, 0], [65536, 0, 0, 0]], np.int32)
    blob = pack_query_blob(queries, q_tids, q_idfs, q_bins, 2, -1, -1,
                           np.asarray([0.5, 0.5], np.float32), s)
    out = jax.jit(_unpack_query_blob, static_argnums=(1, 2, 3, 4))(
        jax.numpy.asarray(blob), bq, d, t, s)
    ind = np.asarray(out[4])
    assert ind[0, 40000] == 1 and ind[0, 7] == -1
    assert ind[1, 65535] == 1
    assert abs(ind).sum() == 3
    # and make_query_bins reports int32 for wide sketches
    bm.add_document(0, "alpha bravo")
    got = bm.make_query_bins(["alpha bravo"])
    assert got.dtype == np.int32
    assert (np.abs(got[got != 0]) - 1 < s).all()


def test_blob_sketch_matches_explicit_program(setup):
    """search_rows' single-upload blob path returns the same rows as the
    explicit-args sketch program (fp16 queries: rankings agree on a clear
    corpus; scores agree to fp16 tolerance)."""
    import jax.numpy as jnp

    from radiant_rag_tpu.index import hybrid as H
    from radiant_rag_tpu.ops import quantize as qz

    vecs, texts, searcher = setup
    rng = np.random.default_rng(11)
    b = 5
    qd = vecs[:b] + 0.05 * rng.standard_normal((b, vecs.shape[1])).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=1, keepdims=True)
    qd = qd.astype(np.float16).astype(np.float32)  # make fp16 lossless
    qt = [texts[i] for i in range(b)]

    res = searcher.search_rows(qd, qt, bm25_mode="sketch")

    eng, bm25 = searcher.engine, searcher.bm25
    num_docs = eng.capacity
    tids = bm25.query_tids(qt)
    qind = bm25.make_query_indicator(qt, tids)
    q_tids, q_idfs = bm25.make_query_terms(qt, tids=tids)
    qdev, qvalid, _ = eng._bucket_queries(qd)
    bq = int(qdev.shape[0])
    pad = bq - qind.shape[0]
    qind = np.pad(qind, ((0, pad), (0, 0)))
    q_tids = np.pad(q_tids, ((0, pad), (0, 0)), constant_values=-1)
    q_idfs = np.pad(q_idfs, ((0, pad), (0, 0)))
    packed = H._hybrid_program_sketch(
        eng.vecs, eng.codes, eng.i8, *qz.int8_scale_offset(eng.i8_lo, eng.i8_hi),
        eng.valid, eng.level, eng.lang,
        bm25._sketch, bm25._sketch_scale, jnp.asarray(qind),
        bm25._dm_tids, bm25._dm_tfs, bm25._dl_dev,
        jnp.asarray(bm25.avgdl, jnp.float32),
        jnp.asarray(q_tids), jnp.asarray(q_idfs),
        qdev, qvalid, jnp.asarray(-1, jnp.int32), jnp.asarray(-1, jnp.int32),
        jnp.asarray(searcher.leg_weights, jnp.float32),
        10, 10, 15, 60, 40, 40, "binary", bm25.k1, bm25.b, "confidence",
        eng.stage1_select)
    ref = H.HybridSearcher._unpack(np.asarray(packed)[:b], 10, 10, 15)

    for leg in ("dense", "bm25", "fused"):
        np.testing.assert_array_equal(res[leg][1], ref[leg][1])
        np.testing.assert_allclose(res[leg][0], ref[leg][0], rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("bm25_mode", ["pages", "sketch"])
def test_hybrid_score_fusion_mode(setup, bm25_mode):
    """fusion='score' runs in both device programs and respects leg weights:
    with all weight on bm25, fused head == bm25 head."""
    vecs, texts, searcher = setup
    q = vecs[20:22]
    old_w = searcher.leg_weights
    try:
        searcher.leg_weights = np.asarray([0.0, 1.0], np.float32)
        res = searcher.search_rows(
            q, ["kilo lima mike", "alpha bravo charlie"], dense_k=5, bm25_k=5,
            fused_k=5, fusion="score", bm25_mode=bm25_mode)
        for qi in range(2):
            bm_head = [int(r) for r in res["bm25"][1][qi] if r >= 0]
            fused = [int(r) for r in res["fused"][1][qi] if r >= 0]
            assert fused[: len(bm_head)] == bm_head
    finally:
        searcher.leg_weights = old_w


def test_calibration_selects_fusion_mode(rng):
    """calibrate_fusion evaluates candidate fusion configs on its probes and
    ships the argmax as the "auto" default: with a PERFECT dense leg (query
    embedding == doc embedding) and near-parity bm25, the selected config
    must score >= calibrated RRF on the probes, and fusion='auto' resolves
    to the selected mode."""
    import numpy as np

    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.hybrid import HybridSearcher
    from radiant_rag_tpu.index.store import TpuVectorStore

    texts = [f"unique{i} subject{i % 7} verb{i % 11} object{i}" for i in range(64)]
    embs = rng.standard_normal((64, 16)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    by_text = {t: embs[i] for i, t in enumerate(texts)}
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=64))
    store.upsert_batch([(t, {}, embs[i]) for i, t in enumerate(texts)])
    bm25 = BM25Index(sketch_dim=128)
    rows = [store.row_of(store.make_doc_id(t, {})) for t in texts]
    bm25.bulk_build(rows, texts)
    searcher = HybridSearcher(store.engine, bm25)

    def text_of(row):
        doc_id = store.id_for_row(row)
        doc = store.get_doc(doc_id) if doc_id else None
        return doc.content if doc else None

    def embed(qs):
        # oracle encoder: a probe made from doc words maps to that doc's
        # embedding (word -> source doc via the unique{i} token)
        out = np.zeros((len(qs), 16), np.float32)
        for qi, q in enumerate(qs):
            hit = None
            for w in q.split():
                if w.startswith("unique"):
                    hit = by_text[texts[int(w[6:])]]
                    break
            out[qi] = hit if hit is not None else rng.standard_normal(16)
        return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)

    searcher.calibrate_fusion(embed, text_of, n_probes=32)
    cal = searcher.last_calibration
    assert cal["fusion_mode"] in ("confidence", "score")
    assert "probe_fused_mrr" in cal and "confidence" in cal["probe_fused_mrr"]
    # held-out selection: every candidate carries select + confirm MRR and
    # the chosen config comes from the pooled near-tie set — within eps
    # (eps=0.02; the confirm override needs a 0.03 margin) of the best
    # select MRR — with a perfect dense leg the leg-quality gate never fires
    chosen_key = ("confidence" if cal["fusion_mode"] == "confidence"
                  else f"score@{cal['weights'][0]:.2f}")
    table = cal["probe_fused_mrr"]
    assert chosen_key in table
    assert set(table[chosen_key]) == {"select", "confirm"}
    best_select = max(v["select"] for v in table.values())
    assert table[chosen_key]["select"] >= best_select - 0.03 - 1e-9
    assert chosen_key in cal["pooled_near_ties"]
    assert cal["n_seeds"] >= 1 and cal["seed_configs"]

    # 'auto' resolves to the selected mode: identical results
    q = embed(["unique5 subject5"])
    auto = searcher.search_rows(q, ["unique5 subject5"], dense_k=5, bm25_k=5,
                                fused_k=5, fusion="auto")
    explicit = searcher.search_rows(q, ["unique5 subject5"], dense_k=5,
                                    bm25_k=5, fused_k=5,
                                    fusion=cal["fusion_mode"])
    assert auto["fused"][1].tolist() == explicit["fused"][1].tolist()


def test_invalidate_resets_fusion_mode(rng):
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.hybrid import HybridSearcher
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    import numpy as np

    store = TpuVectorStore(dim=8, index_config=IndexConfig(dim=8, initial_capacity=8))
    searcher = HybridSearcher(store.engine, BM25Index(sketch_dim=64))
    searcher.fusion_mode = "score"
    searcher.leg_weights = np.asarray([0.3, 0.7], np.float32)
    searcher.invalidate_calibration()
    assert searcher.fusion_mode == "confidence"
    np.testing.assert_allclose(searcher.leg_weights, [0.5, 0.5])


def test_device_resident_queries_match_host(setup):
    """search_rows(_qdev=...) == search_rows(host vectors): the serving fast
    path that keeps embeddings on device (no d2h fetch between the embed and
    hybrid programs) must not change any leg's results."""
    import jax.numpy as jnp

    vecs, texts, searcher = setup
    qtexts = ["alpha bravo doc1", "echo foxtrot", "zulu yankee", "kilo lima"]
    q = vecs[:4]
    host = searcher.search_rows(q, qtexts, dense_k=5, bm25_k=5, fused_k=8,
                                bm25_mode="sketch")
    bq = searcher.engine._bucket_of(len(qtexts))
    qdev = jnp.zeros((bq, q.shape[1]), jnp.float32).at[:4].set(jnp.asarray(q))
    dev = searcher.search_rows(None, qtexts, dense_k=5, bm25_k=5, fused_k=8,
                               bm25_mode="sketch", _qdev=qdev)
    for leg in ("dense", "bm25", "fused"):
        np.testing.assert_array_equal(host[leg][1], dev[leg][1])
        np.testing.assert_allclose(host[leg][0], dev[leg][0], rtol=2e-3,
                                   atol=1e-5)


def test_device_resident_queries_pages_fallback(setup):
    """A _qdev batch routed to the exact-pages program falls back to host
    queries transparently (rare-term routing)."""
    import jax.numpy as jnp

    vecs, texts, searcher = setup
    qtexts = ["alpha bravo doc1", "echo foxtrot"]
    q = vecs[:2]
    host = searcher.search_rows(q, qtexts, dense_k=5, bm25_k=5, fused_k=8,
                                bm25_mode="pages")
    bq = searcher.engine._bucket_of(2)
    qdev = jnp.zeros((bq, q.shape[1]), jnp.float32).at[:2].set(jnp.asarray(q))
    dev = searcher.search_rows(None, qtexts, dense_k=5, bm25_k=5, fused_k=8,
                               bm25_mode="pages", _qdev=qdev)
    for leg in ("dense", "bm25", "fused"):
        np.testing.assert_array_equal(host[leg][1], dev[leg][1])


def test_embed_queries_device_fallback_contract(setup):
    """embed_queries_device returns None (host fallback) for non-JAX
    backends, dim mismatches, and oversized batches; a device array
    otherwise."""
    import jax

    from radiant_rag_tpu.index.hybrid import embed_queries_device

    vecs, texts, searcher = setup
    eng = searcher.engine

    class FakeEmbedder:
        embedding_dimension = eng.dim

        def embed_device(self, texts, pad_to):
            import jax.numpy as jnp
            return jnp.zeros((pad_to, eng.dim), jnp.float32)

    out = embed_queries_device(FakeEmbedder(), eng, ["a", "b", "c"])
    assert isinstance(out, jax.Array)
    assert out.shape == (eng._bucket_of(3), eng.dim)

    class NoDevice:  # HTTP/torch-style backend
        embedding_dimension = eng.dim

    assert embed_queries_device(NoDevice(), eng, ["a"]) is None

    class WrongDim(FakeEmbedder):
        embedding_dimension = eng.dim + 1

    assert embed_queries_device(WrongDim(), eng, ["a"]) is None

    oversized = ["q"] * (eng.max_query_bucket() + 1)
    assert embed_queries_device(FakeEmbedder(), eng, oversized) is None

    class Raises(FakeEmbedder):
        def embed_device(self, texts, pad_to):
            raise RuntimeError("tokenizer quirk")

    assert embed_queries_device(Raises(), eng, ["a"]) is None
