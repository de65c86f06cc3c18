"""TpuVectorStore integration tests: upsert/retrieve/filter/delete/persist.

The reference never tests vector retrieval itself (SURVEY.md §4); here every
retrieval mode is checked against the numpy oracle backend.
"""

import numpy as np
import pytest

from radiant_rag_tpu.config import IndexConfig, QuantizationConfig
from radiant_rag_tpu.index.store import TpuVectorStore
from radiant_rag_tpu.index.numpy_store import NumpyVectorStore


def _mk_store(dim=64, **q):
    return TpuVectorStore(
        dim=dim,
        index_config=IndexConfig(dim=dim, initial_capacity=256),
        quantization=QuantizationConfig(**q),
    )


def _corpus(rng, n, dim):
    docs = []
    for i in range(n):
        v = rng.standard_normal(dim).astype(np.float32)
        docs.append((f"document number {i} about topic {i % 7}", {"source": f"s{i}"}, v))
    return docs


def test_upsert_and_get(rng):
    store = _mk_store()
    doc_id = store.upsert("hello world", {"source": "a"}, rng.standard_normal(64))
    doc = store.get_doc(doc_id)
    assert doc is not None and doc.content == "hello world"
    assert store.has_embedding(doc_id)
    assert store.count_documents() == 1
    assert store.ping()


def test_doc_id_deterministic():
    store = _mk_store()
    id1 = store.make_doc_id("same content", {"source": "x"})
    id2 = store.make_doc_id("same content", {"source": "x"})
    id3 = store.make_doc_id("same content", {"source": "y"})
    assert id1 == id2 != id3


def test_upsert_idempotent(rng):
    store = _mk_store()
    v = rng.standard_normal(64)
    id1 = store.upsert("same doc", {"source": "a"}, v)
    id2 = store.upsert("same doc", {"source": "a"}, v)
    assert id1 == id2
    assert store.count_documents() == 1
    assert store.engine.count == 1  # no duplicate row


def test_doc_only_upsert():
    store = _mk_store()
    doc_id = store.upsert_doc_only("parent doc", {"doc_level": "parent"})
    assert store.get_doc(doc_id) is not None
    assert not store.has_embedding(doc_id)
    assert doc_id in store.list_doc_ids()
    assert doc_id not in store.list_doc_ids_with_embeddings()


@pytest.mark.parametrize("quantized", [None, False, True])
def test_retrieval_matches_oracle(rng, quantized):
    dim = 64
    tpu = _mk_store(dim=dim)
    oracle = NumpyVectorStore(dim=dim)
    docs = _corpus(rng, 200, dim)
    tpu.upsert_batch(docs)
    for c, m, e in docs:
        oracle.upsert(c, m, e)
    q = rng.standard_normal(dim)
    got = tpu.retrieve_by_embedding_batch(q[None, :], top_k=10, quantized=quantized)[0]
    want = oracle.retrieve_by_embedding(q, top_k=10)
    got_ids = [d.doc_id for d, _ in got]
    want_ids = [d.doc_id for d, _ in want]
    if quantized is False:
        # exact mode must match the oracle top-10 (ties aside)
        assert len(set(got_ids) & set(want_ids)) >= 9
    else:
        # quantized two-stage on pure random gaussians (worst case for sign
        # sketches) still recovers most of the true top-10
        assert len(set(got_ids) & set(want_ids)) >= 6
    # scores are real cosines
    for d, s in got:
        assert -1.01 <= s <= 1.01


def test_min_similarity_filter(rng):
    store = _mk_store()
    docs = _corpus(rng, 50, 64)
    store.upsert_batch(docs)
    q = np.asarray(docs[0][2])
    hits = store.retrieve_by_embedding(q, top_k=10, min_similarity=0.99)
    assert all(s >= 0.99 for _, s in hits)
    assert len(hits) >= 1  # the doc itself


def test_doc_level_filter(rng):
    store = _mk_store()
    store.upsert("leaf one", {"doc_level": "leaf"}, rng.standard_normal(64))
    store.upsert("parent one", {"doc_level": "parent"}, rng.standard_normal(64))
    q = rng.standard_normal(64)
    leaves = store.retrieve_by_embedding(q, top_k=10, min_similarity=-1.0, doc_level_filter="leaf")
    assert [d.doc_level for d, _ in leaves] == ["leaf"]
    parents = store.retrieve_by_embedding(q, top_k=10, min_similarity=-1.0, doc_level_filter="parent")
    assert [d.doc_level for d, _ in parents] == ["parent"]


def test_language_filter(rng):
    store = _mk_store()
    store.upsert("english doc", {"language_code": "en"}, rng.standard_normal(64))
    store.upsert("german doc", {"language_code": "de"}, rng.standard_normal(64))
    q = rng.standard_normal(64)
    en = store.retrieve_by_embedding(q, top_k=10, min_similarity=-1.0, language_filter="en")
    assert [d.language_code for d, _ in en] == ["en"]
    none = store.retrieve_by_embedding(q, top_k=10, min_similarity=-1.0, language_filter="fr")
    assert none == []


def test_delete(rng):
    store = _mk_store()
    docs = _corpus(rng, 20, 64)
    ids = store.upsert_batch(docs)
    assert store.delete_doc(ids[0])
    assert not store.delete_doc(ids[0])
    assert store.get_doc(ids[0]) is None
    q = np.asarray(docs[0][2])
    hits = store.retrieve_by_embedding(q, top_k=20, min_similarity=-1.0)
    assert ids[0] not in [d.doc_id for d, _ in hits]


def test_capacity_growth(rng):
    store = TpuVectorStore(dim=32, index_config=IndexConfig(dim=32, initial_capacity=256))
    docs = _corpus(rng, 700, 32)
    store.upsert_batch(docs)
    assert store.engine.count == 700
    assert store.engine.capacity >= 700
    q = np.asarray(docs[123][2])
    hits = store.retrieve_by_embedding(q, top_k=5, quantized=False)
    assert hits[0][0].content == docs[123][0]


def test_index_info_and_drop(rng):
    store = _mk_store()
    store.upsert_batch(_corpus(rng, 10, 64))
    info = store.get_index_info()
    assert info["num_embedded"] == 10
    assert info["backend"] == "tpu"
    assert info["memory_bytes"]["binary"] < info["memory_bytes"]["fp32"]
    store.drop_index()
    assert store.count_documents() == 0
    assert store.retrieve_by_embedding(np.ones(64), top_k=5) == []


def test_save_load_roundtrip(rng, tmp_path):
    store = _mk_store()
    docs = _corpus(rng, 30, 64)
    ids = store.upsert_batch(docs)
    store.upsert_doc_only("a parent", {"doc_level": "parent"})
    store.delete_doc(ids[5])
    store.save(str(tmp_path / "idx"))

    loaded = TpuVectorStore.load(str(tmp_path / "idx"))
    assert loaded.count_documents() == store.count_documents()
    assert loaded.get_doc(ids[3]).content == docs[3][0]
    q = np.asarray(docs[7][2])
    a = [d.doc_id for d, _ in store.retrieve_by_embedding(q, top_k=5)]
    b = [d.doc_id for d, _ in loaded.retrieve_by_embedding(q, top_k=5)]
    assert a == b
    # deleted doc stays deleted after reload
    assert loaded.get_doc(ids[5]) is None


def test_factory():
    from radiant_rag_tpu.config import AppConfig
    from radiant_rag_tpu.index.factory import create_vector_store, validate_backend_config

    cfg = AppConfig()
    store = create_vector_store(cfg)
    assert store.ping()
    assert validate_backend_config(cfg)["valid"]


def test_fp32_free_memory_mode(rng):
    """store_fp32=False: int8-dequant rescoring, halved HBM, recall holds."""
    cfg = IndexConfig(dim=64, initial_capacity=256, store_fp32=False)
    store = TpuVectorStore(dim=64, index_config=cfg)
    docs = _corpus(rng, 200, 64)
    store.upsert_batch(docs)
    info = store.get_index_info()
    assert info["memory_bytes"]["fp32"] == 0
    q = np.asarray(docs[17][2])
    hits = store.retrieve_by_embedding(q, top_k=5)
    assert hits and hits[0][0].content == docs[17][0]
    # exact mode silently degrades to int8 (no fp32 resident)
    hits2 = store.retrieve_by_embedding(q, top_k=5, quantized=False)
    assert hits2 and hits2[0][0].content == docs[17][0]
    # recall vs a full store
    full = TpuVectorStore(dim=64, index_config=IndexConfig(dim=64, initial_capacity=256))
    full.upsert_batch(docs)
    qv = rng.standard_normal(64)
    a = {d.doc_id for d, _ in store.retrieve_by_embedding(qv, top_k=10, min_similarity=-1)}
    b = {d.doc_id for d, _ in full.retrieve_by_embedding(qv, top_k=10, min_similarity=-1)}
    assert len(a & b) >= 6


def test_oversized_query_batch_chunks(rng):
    store = _mk_store(dim=32)
    docs = _corpus(rng, 60, 32)
    store.upsert_batch(docs)
    q = np.stack([np.asarray(d[2]) for d in docs] * 25)  # 1500 queries > 1024 max bucket
    results = store.retrieve_by_embedding_batch(q, top_k=3, min_similarity=-1.0)
    assert len(results) == 1500
    assert results[0][0][0].content == docs[0][0]
    assert results[1499][0][0].content == docs[59][0]


def test_bf16_vector_storage(rng):
    """index.dtype='bfloat16' halves resident fp32 memory; recall holds
    (rescoring accumulates in f32)."""
    cfg16 = IndexConfig(dim=64, initial_capacity=256, dtype="bfloat16")
    s16 = TpuVectorStore(dim=64, index_config=cfg16)
    s32 = TpuVectorStore(dim=64, index_config=IndexConfig(dim=64, initial_capacity=256))
    docs = _corpus(rng, 150, 64)
    s16.upsert_batch(docs)
    s32.upsert_batch(docs)
    assert s16.get_index_info()["memory_bytes"]["fp32"] == \
        s32.get_index_info()["memory_bytes"]["fp32"] // 2
    q = rng.standard_normal(64)
    a = [d.doc_id for d, _ in s16.retrieve_by_embedding(q, top_k=10, min_similarity=-1)]
    b = [d.doc_id for d, _ in s32.retrieve_by_embedding(q, top_k=10, min_similarity=-1)]
    assert len(set(a) & set(b)) >= 8
    # exact mode works on bf16 storage too
    e = [d.doc_id for d, _ in s16.retrieve_by_embedding(q, top_k=10, min_similarity=-1,
                                                        quantized=False)]
    assert len(set(e) & set(b)) >= 8


def test_upsert_batch_duplicate_ids_single_row(rng):
    """Regression (ADVICE r1 low): duplicate content-hash ids within one
    batch must map to ONE engine row, with no orphaned valid rows."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=64))
    emb = rng.standard_normal(16)
    ids = store.upsert_batch([
        ("same content", {"m": 1}, emb),
        ("same content", {"m": 1}, emb),   # exact dup (content+meta hash)
        ("other content", {"m": 2}, rng.standard_normal(16)),
    ])
    assert ids[0] == ids[1]
    assert store.engine.count == 2  # not 3
    import numpy as np
    valid = np.asarray(store.engine.valid)[: store.engine.count]
    assert valid.all()
    # every valid row must be mapped to an id (no orphan slots in top-k)
    for row in range(store.engine.count):
        assert store.docstore.row_to_id.get(row) is not None
    res = store.retrieve_by_embedding_batch(emb, top_k=3, min_similarity=-1.0)[0]
    assert len(res) == 2  # both live docs, no silently dropped slots


def test_dim_mismatch_guards(tmp_path, rng):
    """A persisted index built for one embedder dim must fail fast — at
    factory load and at upsert — instead of crashing inside a jitted append
    (regression: dim-32 saved index + dim-384 embedder hit a
    dynamic_update_slice shape error deep in jit)."""
    import pytest

    from radiant_rag_tpu.config import AppConfig, IndexConfig
    from radiant_rag_tpu.index.factory import create_vector_store
    from radiant_rag_tpu.index.store import TpuVectorStore

    d = str(tmp_path / "idx")
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=64, data_dir=d))
    store.upsert_batch([("hello world", {}, rng.standard_normal(16))])
    store.save(d)

    with pytest.raises(ValueError, match="dim=16 but config.index.dim=32"):
        create_vector_store(AppConfig(index=IndexConfig(dim=32, data_dir=d)))

    with pytest.raises(ValueError, match="embedding dim 32 != index dim 16"):
        store.upsert_batch([("other doc", {}, rng.standard_normal(32))])

    # matching dim still loads
    loaded = create_vector_store(AppConfig(index=IndexConfig(dim=16, data_dir=d)))
    assert loaded.count_documents() == 1


def test_max_query_bucket_hbm_gate(monkeypatch):
    """The HBM gate budgets the PEAK single (B, N) 4-byte transient
    (sequential leg scheduling — see engine.SCORE_BYTES_CAP): measured-safe
    points are B=4096 at <=512k rows and B=2048 at 1M rows (chip-validated,
    BENCH_NOTES round 2/3); 2M rows drops to 1024. There is NO fixed floor:
    past ~9M rows the bucket keeps shrinking so the transient stays inside
    the budget (the old 256 floor compiled 17 GB programs at 16.7M rows —
    the round-4 10M OOM); the dense auto-select flips to chunked there."""
    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    monkeypatch.delenv("RAD_MAX_QUERY_BUCKET", raising=False)
    eng = DeviceVectorIndex(16, initial_capacity=256)
    for capacity, expect in [
        (1 << 17, 4096),   # 131k rows (the 100k bench corpus)
        (1 << 19, 4096),   # 512k — admitted by the sequential model
        (1 << 20, 2048),   # 1M north-star corpus
        (1 << 21, 1024),
        (1 << 23, 256),    # 8.4M: last capacity where 256 fits the budget
        (1 << 25, 64),     # 33.5M: keeps shrinking — no floor
    ]:
        eng.capacity = capacity
        got = eng.max_query_bucket()
        assert got == expect, (capacity, got, expect)
        # budget actually respected
        assert got * capacity * 4 <= DeviceVectorIndex.SCORE_BYTES_CAP


def test_max_query_bucket_override_clamps_to_real_bucket(monkeypatch):
    """A non-power-of-two RAD_MAX_QUERY_BUCKET must clamp DOWN to a real
    bucket (3000 -> 2048), never round up past what the operator validated."""
    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    eng = DeviceVectorIndex(16, initial_capacity=256)
    eng.capacity = 1 << 21  # large enough that the gate alone would say 1024
    for env, expect in [("3000", 2048), ("4096", 4096), ("1024", 1024),
                        ("700", 512), ("1", 1), ("0", 1)]:
        monkeypatch.setenv("RAD_MAX_QUERY_BUCKET", env)
        assert eng.max_query_bucket() == expect, (env, expect)
        assert eng.max_query_bucket() in DeviceVectorIndex.QUERY_BUCKETS


def test_max_query_bucket_chunked_select_ungated(monkeypatch):
    """Chunked stage-1 select never materializes (B, N), so the score-buffer
    gate must not shrink the bucket (the >=10M fp32-free configuration)."""
    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    monkeypatch.delenv("RAD_MAX_QUERY_BUCKET", raising=False)
    eng = DeviceVectorIndex(16, initial_capacity=256,
                            stage1_select="bf16_chunked")
    eng.capacity = 1 << 24  # 16.7M rows
    assert eng.max_query_bucket() == DeviceVectorIndex.QUERY_BUCKETS[-1]


def test_stage1_select_auto_policy(monkeypatch):
    """Auto stage-1 select: f32 below 1M rows, bf16 at >=1M (HBM-bound
    bucket); explicit config/env always wins; growth across the boundary
    re-resolves."""
    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    monkeypatch.delenv("RAD_STAGE1_SELECT", raising=False)
    assert DeviceVectorIndex(16, initial_capacity=256).stage1_select == "f32"
    big = DeviceVectorIndex.__new__(DeviceVectorIndex)
    big.capacity = 1 << 20
    big.dim, big.words, big.store_fp32 = 16, 1, True
    import jax.numpy as _jnp

    big.vec_dtype = _jnp.float32
    assert DeviceVectorIndex._auto_select(big) == "bf16"
    # deep fp32-free territory: even a B=256 (B, N) transient no longer fits
    # next to the residency -> the auto policy flips to the chunked scan
    big.capacity = 24 << 20
    big.store_fp32 = False
    assert DeviceVectorIndex._auto_select(big) == "bf16_chunked"

    eng = DeviceVectorIndex(16, initial_capacity=256)
    eng._grow(1 << 20)
    assert eng.stage1_select == "bf16"

    monkeypatch.setenv("RAD_STAGE1_SELECT", "bf16_chunked")
    eng2 = DeviceVectorIndex(16, initial_capacity=256)
    assert eng2.stage1_select == "bf16_chunked"
    eng2._grow(1 << 20)
    assert eng2.stage1_select == "bf16_chunked"  # explicit survives growth

    explicit = DeviceVectorIndex(16, initial_capacity=256, stage1_select="f32")
    explicit._grow(1 << 20)
    assert explicit.stage1_select == "f32"
