"""BM25 index tests (reference analog: `tests/test_all.py:349-700` — tokenize,
index, persistence round-trip) plus device-scoring-vs-oracle checks."""

import math

import numpy as np
import pytest

from radiant_rag_tpu.config import IndexConfig
from radiant_rag_tpu.index.bm25 import BM25Index, PersistentBM25Index, tokenize
from radiant_rag_tpu.index.store import TpuVectorStore


def test_tokenize_reference_semantics():
    # lowercase, alnum runs only, len>1 (reference bm25_index.py:50-58)
    assert tokenize("Hello, World! A b2b X") == ["hello", "world", "b2b"]
    assert tokenize("") == []
    assert tokenize("C++ is fun-fun 42") == ["is", "fun", "fun", "42"]


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a lazy dog sleeps all day long",
    "quick quick brown foxes are quick",
    "completely unrelated text about turnips",
    "dogs and foxes are animals",
]


def _python_bm25(docs_tokens, query_terms, k1=1.5, b=0.75):
    n = len(docs_tokens)
    avgdl = sum(len(t) for t in docs_tokens) / n
    scores = np.zeros(n)
    for term in set(query_terms):
        df = sum(1 for t in docs_tokens if term in t)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        for d, toks in enumerate(docs_tokens):
            tf = toks.count(term)
            if tf:
                scores[d] += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
    return scores


def test_bm25_index_matches_python_oracle():
    idx = BM25Index()
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    toks = [tokenize(d) for d in DOCS]
    for query in ["quick dog", "lazy", "brown foxes", "turnips animals quick"]:
        oracle = _python_bm25(toks, tokenize(query))
        scores, rows = idx.search_rows(query, top_k=5)
        hits = {int(r): float(s) for r, s in zip(rows, scores) if r >= 0 and s > 0}
        expect = {d: oracle[d] for d in range(len(DOCS)) if oracle[d] > 0}
        assert set(hits) == set(expect), query
        for d in expect:
            np.testing.assert_allclose(hits[d], expect[d], rtol=1e-4)


def test_bm25_incremental_add_updates_stats():
    idx = BM25Index()
    idx.add_document(0, DOCS[0])
    s1, _ = idx.search_rows("quick", top_k=3)
    idx.add_document(1, DOCS[2])
    # adding another 'quick' doc changes df -> idf changes
    s2, r2 = idx.search_rows("quick", top_k=3)
    assert idx.num_docs == 2
    assert (r2 >= 0).sum() == 2


def test_bm25_remove_and_rebuild():
    idx = BM25Index()
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    assert idx.remove_document(1)
    assert not idx.remove_document(99)
    _, rows = idx.search_rows("lazy dog", top_k=5)
    assert 1 not in set(int(r) for r in rows if r >= 0)
    assert idx.num_docs == len(DOCS) - 1


def test_bm25_serialization_roundtrip():
    idx = BM25Index(k1=1.2, b=0.6)
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    data = idx.to_dict()
    idx2 = BM25Index.from_dict(data)
    assert idx2.k1 == 1.2 and idx2.b == 0.6
    assert idx2.num_docs == idx.num_docs
    s1, r1 = idx.search_rows("quick dog", top_k=5)
    s2, r2 = idx2.search_rows("quick dog", top_k=5)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_array_equal(r1, r2)


def _store_with_docs(rng, texts):
    store = TpuVectorStore(dim=32, index_config=IndexConfig(dim=32, initial_capacity=256))
    docs = [(t, {"source": f"s{i}"}, rng.standard_normal(32)) for i, t in enumerate(texts)]
    store.upsert_batch(docs)
    return store


def test_persistent_bm25_lifecycle(rng, tmp_path):
    store = _store_with_docs(rng, DOCS)
    path = str(tmp_path / "bm25.json.gz")
    pidx = PersistentBM25Index(store, path=path)
    n = pidx.build_from_store()
    assert n == len(DOCS)

    hits = pidx.search("quick dog", top_k=3)
    assert hits and all(s > 0 for _, s in hits)
    assert "quick" in hits[0][0].content or "dog" in hits[0][0].content

    # persistence: reload against the same store
    pidx2 = PersistentBM25Index(store, path=path)
    hits2 = pidx2.search("quick dog", top_k=3)
    assert [d.doc_id for d, _ in hits] == [d.doc_id for d, _ in hits2]


def test_persistent_bm25_sync(rng, tmp_path):
    store = _store_with_docs(rng, DOCS[:3])
    pidx = PersistentBM25Index(store, path=str(tmp_path / "b.json.gz"))
    pidx.build_from_store()
    # new docs appear after sync
    store.upsert_batch([(DOCS[3], {}, rng.standard_normal(32)),
                        (DOCS[4], {}, rng.standard_normal(32))])
    added, removed = pidx.sync_with_store()
    assert added == 2 and removed == 0
    hits = pidx.search("turnips", top_k=2)
    assert hits
    # deleted docs disappear after sync
    doc_id = hits[0][0].doc_id
    store.delete_doc(doc_id)
    added, removed = pidx.sync_with_store()
    assert removed == 1
    assert pidx.search("turnips", top_k=2) == []


def test_bm25_respects_store_valid_mask(rng, tmp_path):
    store = _store_with_docs(rng, DOCS)
    pidx = PersistentBM25Index(store, path=str(tmp_path / "b.json.gz"))
    pidx.build_from_store()
    target = pidx.search("turnips", top_k=1)[0][0]
    store.delete_doc(target.doc_id)  # no sync — mask alone must hide it
    assert pidx.search("turnips", top_k=2) == []


def test_auto_build_from_store_when_file_missing(rng, tmp_path):
    store = _store_with_docs(rng, DOCS)
    pidx = PersistentBM25Index(store, path=str(tmp_path / "missing.json.gz"))
    # no build_from_store call — first search auto-builds from the store
    hits = pidx.search("turnips", top_k=2)
    assert hits and "turnips" in hits[0][0].content


def test_persistence_skipped_above_cap(rng, tmp_path):
    store = _store_with_docs(rng, DOCS)
    path = tmp_path / "cap.json.gz"
    pidx = PersistentBM25Index(store, path=str(path), persist_max_docs=2)
    pidx.build_from_store()
    assert not path.is_file()  # too many docs -> persistence skipped
    # still fully functional (and reloads by rebuilding)
    assert pidx.search("quick dog", top_k=2)
    pidx2 = PersistentBM25Index(store, path=str(path), persist_max_docs=2)
    assert pidx2.search("quick dog", top_k=2)


def test_sketch_sparse_build_matches_dense_reference():
    """ensure_sketch aggregates only occupied cells; verify against a
    brute-force dense accumulation (small sketch_dim forces bin collisions)."""
    import numpy as np

    from radiant_rag_tpu.index.bm25 import BM25Index

    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{rng.integers(0, 40)}" for _ in range(25))
             for _ in range(64)]
    idx = BM25Index(sketch_dim=16)
    idx.bulk_build(list(range(64)), texts)
    idx._finalize_csr()
    idx.ensure_sketch(64)
    got = np.asarray(idx._sketch)
    scale = float(idx._sketch_scale)

    dense = np.zeros((64, 16))
    for row, pairs in idx.doc_terms.items():
        dl = idx.doc_lens[row]
        for tid, tf in pairs:
            w = idx._idf(tid) * tf * (idx.k1 + 1) / (
                tf + idx.k1 * (1 - idx.b + idx.b * dl / idx.avgdl))
            dense[row, idx._bin_of(tid)] += w * idx._sign_of(tid)
    ref_scale = np.abs(dense).max() / 127.0
    assert abs(scale - ref_scale) / ref_scale < 1e-6
    ref = np.clip(np.round(dense / ref_scale), -127, 127).astype(np.int8)
    assert np.array_equal(got, ref)


def test_sketch_empty_index():
    from radiant_rag_tpu.index.bm25 import BM25Index

    idx = BM25Index(sketch_dim=16)
    idx._finalize_csr()
    idx.ensure_sketch(0)  # must not raise
    assert idx._sketch.shape == (0, 16)


def test_document_update_does_not_double_score():
    """Regression (ADVICE r1 medium): re-adding an existing row must purge the
    old postings — score after an identity update must equal a fresh index."""
    idx = BM25Index()
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    s_before, _ = idx.search_rows("lazy dog", top_k=5)
    # finalize happened inside search; now update row 1 with identical content
    idx.add_document(1, DOCS[1])
    s_after, r_after = idx.search_rows("lazy dog", top_k=5)
    fresh = BM25Index()
    for row, text in enumerate(DOCS):
        fresh.add_document(row, text)
    s_fresh, r_fresh = fresh.search_rows("lazy dog", top_k=5)
    h_after = {int(r): float(s) for r, s in zip(r_after, s_after) if r >= 0}
    h_fresh = {int(r): float(s) for r, s in zip(r_fresh, s_fresh) if r >= 0}
    assert set(h_after) == set(h_fresh)
    for r in h_fresh:
        np.testing.assert_allclose(h_after[r], h_fresh[r], rtol=1e-5)


def test_document_update_changes_content():
    """Update must replace content: old terms gone, new terms searchable."""
    idx = BM25Index()
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    _ = idx.search_rows("turnips", top_k=3)  # force a finalize w/ old content
    idx.add_document(3, "fresh content about zebras")
    _, rows = idx.search_rows("turnips", top_k=3)
    assert 3 not in {int(r) for r in rows if r >= 0}
    _, rows = idx.search_rows("zebras", top_k=3)
    assert 3 in {int(r) for r in rows if r >= 0}


def test_row_reuse_after_remove_purges_old_postings():
    """A removed row re-added with new content must not resurrect the old
    occupant's base postings."""
    idx = BM25Index()
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    _ = idx.search_rows("lazy", top_k=5)  # finalize: postings in base
    idx.remove_document(1)
    idx.add_document(1, "replacement text about glaciers")
    _, rows = idx.search_rows("sleeps", top_k=5)
    assert 1 not in {int(r) for r in rows if r >= 0}
    s, rows = idx.search_rows("glaciers", top_k=3)
    assert 1 in {int(r) for r in rows if r >= 0}
    # doubled-update after reuse stays exact vs oracle
    toks = [tokenize(d) if i != 1 else tokenize("replacement text about glaciers")
            for i, d in enumerate(DOCS)]
    oracle = _python_bm25(toks, tokenize("lazy dog"))
    s, rows = idx.search_rows("lazy dog", top_k=5)
    hits = {int(r): float(s_) for r, s_ in zip(rows, s) if r >= 0 and s_ > 0}
    for d, val in hits.items():
        np.testing.assert_allclose(val, oracle[d], rtol=1e-4)


def test_legacy_reference_v2_format_loads(rng, tmp_path):
    """Reference v1/v2 files ({doc_ids: [...], doc_tokens: [...]}) must load
    (ADVICE r1 medium: they silently loaded empty and masked the rebuild)."""
    import gzip
    import json

    store = _store_with_docs(rng, DOCS)
    ids = store.list_doc_ids_with_embeddings()
    payload = {
        "version": 2,
        "k1": 1.5,
        "b": 0.75,
        "doc_ids": ids,
        "doc_tokens": [tokenize(store.get_doc(i).content) for i in ids],
    }
    path = tmp_path / "bm25.json.gz"
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(payload, fh)
    pidx = PersistentBM25Index(store, path=str(path))
    assert pidx.get_stats()["num_docs"] == len(DOCS)
    hits = pidx.search("quick dog", top_k=3)
    assert hits and all(s > 0 for _, s in hits)


def test_foreign_index_file_triggers_store_rebuild(rng, tmp_path):
    """A file whose doc ids resolve to nothing against this store must not
    mask the auto-rebuild-from-store path."""
    import gzip
    import json

    store = _store_with_docs(rng, DOCS)
    path = tmp_path / "bm25.json.gz"
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump({"version": 3, "k1": 1.5, "b": 0.75,
                   "docs": {"nonexistent-id": {"l": 2, "t": [["zz", 1]]}}}, fh)
    pidx = PersistentBM25Index(store, path=str(path))
    assert pidx.get_stats()["num_docs"] == len(DOCS)


def test_auto_routes_rare_term_queries_to_exact_pages():
    """A singleton term on a huge unique-vocab corpus must be found with
    method='auto' (the sketch's hashed bins drown it; routing by posting
    volume sends rare-term queries down the exact path)."""
    idx = BM25Index()
    n, per = 1500, 100
    texts = [" ".join(f"t{d}q{i}" for i in range(per)) + " shared"
             for d in range(n)]
    idx.bulk_build(list(range(n)), texts)
    s, r = idx.search_rows("shared t3q7", top_k=5)  # method defaults to auto
    assert int(r[0]) == 3, r[:5].tolist()
    # a high-volume query must still route to sketch
    assert idx.query_posting_volume(["shared"]) == n
    big_vol_q = ["shared " + " ".join(f"t{d}q0" for d in range(30))]
    assert idx.query_posting_volume(big_vol_q) <= idx.pages_route_threshold


def test_auto_routes_discriminative_at_volume_to_pages():
    """A query whose posting volume exceeds the pages threshold but that
    contains a discriminative (low-df) term must route to the exact pages
    path: the 1M router study measured the sketch failing exactly this
    family (the rare term's candidates buried in the hashing noise tail),
    while all-common-term traffic stays on the sketch."""
    idx = BM25Index(pages_route_threshold=64)
    n = 256
    # every doc shares 4 common words; doc d also has a unique marker
    texts = [f"alpha beta gamma delta uniq{d}" for d in range(n)]
    idx.bulk_build(list(range(n)), texts)
    disc_q = ["alpha beta gamma uniq42"]  # volume 3n+1 >> 64, df(uniq42)=1
    assert idx.query_posting_volume(disc_q) > idx.pages_route_threshold
    assert idx.routes_pages(disc_q)
    common_q = ["alpha beta gamma delta"]
    assert not idx.routes_pages(common_q)  # all-common at volume -> sketch
    # batch granularity: method selects ONE device program, so a mixed
    # batch routes pages only when EVERY query qualifies (a lone all-common
    # query keeps the batch on the sketch; serving per-request batches are
    # b=1, so single-user traffic routes per query)
    assert not idx.routes_pages(common_q + disc_q)
    # end-to-end: auto finds the unique doc despite the volume
    s, r = idx.search_rows_batch(["alpha beta gamma uniq42"], top_k=3,
                                 method="auto")
    assert int(r[0][0]) == 42, r[0][:3].tolist()


def test_double_update_between_finalizes_keeps_latest_only():
    """The delta-log watermark must survive multiple updates of the same row
    WITHOUT an intervening finalize: only the newest generation of postings
    may reach the CSR (the old per-term purge rewrote lists eagerly; the log
    design filters by position watermark at merge)."""
    idx = BM25Index()
    for row, text in enumerate(DOCS):
        idx.add_document(row, text)
    # no finalize yet: all three generations of row 2 live in the delta log
    idx.add_document(2, "first rewrite about comets")
    idx.add_document(2, "second rewrite about meteors meteors")
    s, rows = idx.search_rows("meteors", top_k=3)
    hits = {int(r) for r in rows if r >= 0}
    assert 2 in hits
    _, rows = idx.search_rows("comets", top_k=3)
    assert 2 not in {int(r) for r in rows if r >= 0}
    # tf of the latest generation only: compare against a fresh index
    fresh = BM25Index()
    for row, text in enumerate(DOCS):
        fresh.add_document(row, "second rewrite about meteors meteors" if row == 2 else text)
    sf, rf = fresh.search_rows("meteors", top_k=3)
    hf = {int(r): float(x) for r, x in zip(rf, sf) if r >= 0}
    s, rows2 = idx.search_rows("meteors", top_k=3)
    ha = {int(r): float(x) for r, x in zip(rows2, s) if r >= 0}
    np.testing.assert_allclose(ha[2], hf[2], rtol=1e-5)


def test_sketch_hbm_budget_reduces_dim():
    """10M-scale guard (VERDICT r4 #5a): when the sketch tier's device
    structures exceed the HBM budget (the (N,S) sketch AND the (N,L)
    doc-major rescore table — 8 B/term/doc), plan_hbm degrades S/L in
    fidelity order, rehashes term bins, and search results stay correct
    (stage-2 rescore is exact)."""
    from radiant_rag_tpu.index.bm25 import BM25Index

    n = 600
    texts = [f"alpha{i % 7} shared beta{i} gamma{i % 11}" for i in range(n)]
    # budget allows n*(256 + 64*8) bytes -> plan lands on S=256, L=64
    idx = BM25Index(sketch_dim=1024,
                    sketch_hbm_budget_gb=n * (256 + 64 * 8) / (1 << 30))
    idx.bulk_build(list(range(n)), texts)
    idx.ensure_sketch(n)
    assert idx.sketch_dim == 256
    assert idx.doc_major_width == 64
    assert idx._sketch.shape == (n, 256)
    s, rows = idx.search_rows_batch(["beta42 alpha0", "gamma3 shared"],
                                    top_k=5, method="sketch",
                                    valid_mask=None, num_rows=n)
    assert 42 in [int(r) for r in rows[0]]


def test_hbm_plan_pages_only_tier():
    """Past the size where even the minimum sketch config (S=128, L=32)
    exceeds the budget, the plan disables the sketch tier entirely and
    every query — including explicit method='sketch' — serves via the
    exact pages path (the documented >=10M configuration)."""
    from radiant_rag_tpu.index.bm25 import BM25Index

    n = 400
    texts = [f"alpha{i % 7} shared beta{i}" for i in range(n)]
    idx = BM25Index(sketch_dim=1024,
                    sketch_hbm_budget_gb=n * 100 / (1 << 30))  # < S128+L32
    idx.bulk_build(list(range(n)), texts)
    s, rows = idx.search_rows_batch(["beta42 alpha0"], top_k=5,
                                    method="sketch", num_rows=n)
    assert idx.sketch_dim == 0  # pages-only tier
    assert idx._sketch is None
    assert 42 in [int(r) for r in rows[0]]
    # a sketch BUILT at a roomy budget must be FREED when the budget shrinks
    # to pages-only (stale device arrays would stay resident in HBM and be
    # excluded from device_bytes_projected — undercounting residency where
    # the bucket gate needs it)
    idx3 = BM25Index(sketch_dim=256)
    idx3.bulk_build(list(range(n)), texts)
    idx3.ensure_sketch(n)
    idx3.ensure_doc_major(n)
    assert idx3._sketch is not None and idx3._dm_tids is not None
    idx3.sketch_hbm_budget_gb = n * 100 / (1 << 30)  # shrink below minimum
    idx3.plan_hbm(n)
    assert idx3.sketch_dim == 0
    assert idx3._sketch is None and idx3._dm_tids is None and idx3._dm_tfs is None
    # a rebuild at small N under a roomy budget restores the configured S
    idx2 = BM25Index(sketch_dim=1024)
    idx2.bulk_build(list(range(10)), texts[:10])
    idx2.ensure_sketch(10)
    assert idx2.sketch_dim == 1024


def test_pages_scatter_index_no_int32_overflow():
    """Regression: the pages program's invalid-slot scatter bucket was
    `b_queries * num_docs`, which hits EXACTLY 2^31 at b=2048 x a 1M-padded
    corpus and overflowed the int32 literal at trace time — any large batch
    routed to the exact pages path crashed (found by the round-5 1M
    pages-cost study). Trace the op at that shape via eval_shape (no
    allocation) and check the small-shape result is still exact."""
    import jax
    import jax.numpy as jnp

    from radiant_rag_tpu.ops.bm25 import bm25_pages_scores

    b_queries, num_docs = 2048, 1 << 20  # b * N == 2**31 exactly
    pg, ptot = 8, 64

    def run(post_rows, post_tf, page_start, page_len, page_qidx, page_idf,
            doc_lens, avgdl, mask):
        return bm25_pages_scores(post_rows, post_tf, page_start, page_len,
                                 page_qidx, page_idf, doc_lens, avgdl, mask,
                                 b_queries, num_docs)

    shapes = (
        jax.ShapeDtypeStruct((ptot,), jnp.int32),
        jax.ShapeDtypeStruct((ptot,), jnp.float32),
        jax.ShapeDtypeStruct((pg,), jnp.int32),
        jax.ShapeDtypeStruct((pg,), jnp.int32),
        jax.ShapeDtypeStruct((pg,), jnp.int32),
        jax.ShapeDtypeStruct((pg,), jnp.float32),
        jax.ShapeDtypeStruct((num_docs,), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        None,
    )
    out = jax.eval_shape(run, *shapes)  # raised OverflowError before the fix
    assert out.shape == (b_queries, num_docs)

    # small-shape exactness: invalid slots (beyond page_len) add nothing
    post_rows = jnp.asarray([0, 1, 2, 3], jnp.int32)
    post_tf = jnp.asarray([2.0, 1.0, 3.0, 1.0], jnp.float32)
    page_start = jnp.asarray([0, 2], jnp.int32)
    page_len = jnp.asarray([2, 1], jnp.int32)  # second page: 1 valid of 2
    page_qidx = jnp.asarray([0, 1], jnp.int32)
    page_idf = jnp.asarray([1.0, 2.0], jnp.float32)
    doc_lens = jnp.full((8,), 4.0, jnp.float32)
    scores = bm25_pages_scores(post_rows, post_tf, page_start, page_len,
                               page_qidx, page_idf, doc_lens,
                               jnp.float32(4.0), None, 2, 8)
    k1, b = 1.5, 0.75
    exp = 1.0 * 2.0 * (k1 + 1) / (2.0 + k1)  # q0, doc0, tf=2, dl=avgdl
    assert abs(float(scores[0, 0]) - exp) < 1e-5
    # q1 gets ONLY its page's first posting (doc 2); the invalid slot
    # (doc 3) must contribute nothing anywhere
    assert float(scores[1, 3]) < 0  # NEG_INF (no contribution)
    assert float(scores[0, 2]) < 0 and float(scores[0, 3]) < 0


def test_routes_pages_cost_gate():
    """Qualifying batches stay on the sketch when the estimated page count
    or the (B, N) score-matrix cells exceed the cost caps (round-5 chip
    study: pages ms/batch is ~linear in pages and the f32 scatter buffer
    OOMs at b=2048 x 1M)."""
    idx = BM25Index(sketch_dim=128)
    texts = [f"rare{i} filler common shared" for i in range(64)]
    idx.bulk_build(list(range(64)), texts)
    qs = ["rare3", "rare7"]
    assert idx.routes_pages(qs)  # rare-term traffic, tiny: pages
    idx.pages_route_max_pages = 0
    assert not idx.routes_pages(qs)  # page budget exhausted -> sketch
    idx.pages_route_max_pages = 4096
    idx.pages_route_max_cells = 1  # 2 queries x 64 docs > 1 cell
    assert not idx.routes_pages(qs)
    idx.pages_route_max_cells = 1 << 30
    assert idx.routes_pages(qs)
    # a num_docs override (padded engine capacity) is what the cells gate
    # must price, not the live-doc count
    idx.pages_route_max_cells = 100
    assert not idx.routes_pages(qs, num_docs=64)
    assert idx.routes_pages(qs, num_docs=32)
