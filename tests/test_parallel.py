"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(the multi-node testing the reference lacks, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiant_rag_tpu.models.bert import BertConfig
from radiant_rag_tpu.parallel.mesh import create_mesh, mesh_info
from radiant_rag_tpu.parallel.sharded_index import ShardedFlatIndex
from radiant_rag_tpu.parallel.train import (
    contrastive_train_step, make_train_state, param_partition_specs,
)

TINY = BertConfig(vocab_size=256, hidden_size=32, num_layers=2, num_heads=2,
                  intermediate_size=64, dtype=jnp.float32)


def test_create_mesh_shapes():
    mesh = create_mesh(data=4, model=2)
    assert mesh_info(mesh) == {"data": 4, "model": 2}
    mesh = create_mesh()  # all devices on data
    assert mesh_info(mesh)["data"] == len(jax.devices())


def test_param_partition_specs_cover_tree():
    from radiant_rag_tpu.models.bert import init_params
    from jax.sharding import PartitionSpec as P

    params = init_params(TINY)
    specs = param_partition_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(specs, is_leaf=lambda x: isinstance(x, P))
    joined = {"/".join(str(getattr(p, "key", p)) for p in path): spec for path, spec in flat}
    qk = [v for k, v in joined.items() if "query/kernel" in k]
    assert qk and all(s == P(None, "model") for s in qk)
    ok = [v for k, v in joined.items() if "out/kernel" in k and "mlp" not in k]
    assert ok and all(s == P("model", None) for s in ok)


def test_sharded_search_matches_single_device(rng):
    mesh = create_mesh(data=4, model=2)
    n, d = 600, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh, vecs)
    queries = vecs[17:21] + 0.05 * rng.standard_normal((4, d)).astype(np.float32)

    s, rows = idx.search(queries, k=10, mode="exact")
    oracle = (queries / np.linalg.norm(queries, axis=1, keepdims=True)) @ vecs.T
    for qi in range(4):
        expect = set(np.argsort(-oracle[qi])[:10])
        assert set(rows[qi]) == expect
        np.testing.assert_allclose(np.sort(s[qi]), np.sort(oracle[qi][sorted(expect, key=lambda r: oracle[qi][r])]), rtol=1e-4)


def test_sharded_search_masks_padding(rng):
    mesh = create_mesh(data=8, model=1)
    # 130 rows over 8 shards -> heavy padding per shard
    vecs = rng.standard_normal((130, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh, vecs)
    s, rows = idx.search(vecs[:3], k=5, mode="exact")
    assert rows.max() < 130  # never returns a padded row
    assert all(rows[i, 0] == i for i in range(3))


def test_train_step_decreases_loss(rng):
    mesh = create_mesh(data=4, model=2)
    state, model, tx, _ = make_train_state(TINY, mesh, learning_rate=1e-3)
    step, place_batch = contrastive_train_step(model, tx, mesh)
    b, s = 8, 16
    batch = place_batch({
        "q_ids": rng.integers(0, 256, (b, s)).astype(np.int32),
        "q_mask": np.ones((b, s), np.int32),
        "d_ids": rng.integers(0, 256, (b, s)).astype(np.int32),
        "d_mask": np.ones((b, s), np.int32),
    })
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # same batch memorized


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 384)
    assert np.all(np.isfinite(np.asarray(out)))


def test_train_checkpoint_roundtrip(tmp_path, rng):
    from radiant_rag_tpu.parallel.checkpoint import TrainCheckpointer
    from radiant_rag_tpu.parallel.train import make_train_state, contrastive_train_step

    mesh = create_mesh(data=2, model=1)
    state, model, tx, _ = make_train_state(TINY, mesh, learning_rate=1e-3)
    step, place_batch = contrastive_train_step(model, tx, mesh)
    batch = place_batch({
        "q_ids": rng.integers(0, 256, (4, 8)).astype(np.int32),
        "q_mask": np.ones((4, 8), np.int32),
        "d_ids": rng.integers(0, 256, (4, 8)).astype(np.int32),
        "d_mask": np.ones((4, 8), np.int32),
    })
    state, _ = step(state, batch)
    ckpt = TrainCheckpointer(str(tmp_path / "ckpt"))
    ckpt.save(int(state.step), jax.device_get(state))
    assert ckpt.latest_step() == 1
    restored = ckpt.restore(template=jax.device_get(state))
    leaves_a = jax.tree.leaves(jax.device_get(state.params))
    leaves_b = jax.tree.leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_sharded_hybrid_matches_single_device(rng):
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.parallel.sharded_index import ShardedHybridIndex

    mesh = create_mesh(data=4, model=2)
    n, d = 700, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    texts = [f"token{i % 37} shared{i % 5} word{i}" for i in range(n)]
    bm25 = BM25Index(sketch_dim=256)
    bm25.bulk_build(list(range(n)), texts)

    idx = ShardedHybridIndex(mesh, vecs, bm25)
    queries = vecs[100:104]
    qtexts = ["token7 shared2", "word5", "token0", "shared4 word9"]
    res = idx.hybrid_search(queries, qtexts, dense_k=5, bm25_k=5, fused_k=8, mode="exact")

    # dense run must match a single-device oracle exactly
    oracle = queries @ vecs.T
    for qi in range(4):
        expect = list(np.argsort(-oracle[qi])[:5])
        got = [int(x) for x in res["dense"][1][qi] if x >= 0]
        assert got == expect, (qi, got, expect)
    # bm25 hits reference rows whose text contains the query terms
    hits0 = [int(x) for x in res["bm25"][1][0] if x >= 0]
    assert hits0
    assert any("token7" in texts[r] or "shared2" in texts[r] for r in hits0)
    # fused is union-ranked, bounded, and ids valid
    fused = [int(x) for x in res["fused"][1][0] if x >= 0]
    assert fused and all(0 <= r < n for r in fused)


def test_contrastive_sampler_and_train_embedder(tmp_path, rng):
    from radiant_rag_tpu.config import EmbeddingConfig, IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.parallel.data import ContrastivePairSampler, make_pseudo_query, train_embedder

    r = np.random.default_rng(0)
    q = make_pseudo_query("One sentence here. Another sentence follows with words.", r)
    assert 1 <= len(q.split()) <= 12

    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=256))
    docs = [(f"document number {i} about topic {i%5} with several extra words", {},
             r.standard_normal(16)) for i in range(40)]
    store.upsert_batch(docs)

    cfg = EmbeddingConfig(dim=16, num_layers=1, num_heads=2, hidden_dim=32,
                          vocab_size=300, max_seq_len=32, batch_size=8, dtype="float32")
    metrics = train_embedder(store, cfg, mesh=create_mesh(data=4, model=2),
                             steps=3, batch_size=8, log_every=1,
                             checkpoint_dir=str(tmp_path / "ckpt"))
    assert np.isfinite(metrics["loss"])
    from radiant_rag_tpu.parallel.checkpoint import TrainCheckpointer

    assert TrainCheckpointer(str(tmp_path / "ckpt")).latest_step() == 3


def test_train_embedder_auto_stop(rng):
    """auto_stop halts on the accuracy plateau well before the step ceiling
    (the `train --auto` stopping criterion): a 40-doc corpus saturates
    in-batch accuracy almost immediately."""
    from radiant_rag_tpu.config import EmbeddingConfig, IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.parallel.data import synonym_augment, train_embedder

    r = np.random.default_rng(1)
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=64))
    store.upsert_batch([
        (f"document number {i} about error handling topic {i % 5}", {},
         r.standard_normal(16)) for i in range(40)])
    cfg = EmbeddingConfig(dim=16, num_layers=1, num_heads=2, hidden_dim=32,
                          vocab_size=300, max_seq_len=32, batch_size=8,
                          dtype="float32", checkpoint_dir="")
    metrics = train_embedder(store, cfg, mesh=create_mesh(data=4, model=2),
                             steps=500, batch_size=8, log_every=5,
                             auto_stop=True, min_steps=20, plateau_window=15,
                             plateau_eps=0.01, query_augment=synonym_augment)
    assert metrics["stop_reason"] in ("accuracy_plateau", "steps_exhausted")
    assert metrics["steps_run"] <= 500
    if metrics["stop_reason"] == "accuracy_plateau":
        assert metrics["steps_run"] < 500


def test_sharded_vector_store_serving(rng):
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

    source = TpuVectorStore(dim=32, index_config=IndexConfig(dim=32, initial_capacity=256))
    texts = [f"token{i % 23} shared word{i}" for i in range(200)]
    embs = rng.standard_normal((200, 32)).astype(np.float32)
    ids = source.upsert_batch([
        (texts[i], {"doc_level": "leaf" if i % 4 else "parent",
                    "source": f"s{i}"}, embs[i])
        for i in range(200)
    ])
    source.delete_doc(ids[7])
    bm25 = BM25Index(sketch_dim=256)
    rows, btexts = [], []
    for i, doc_id in enumerate(ids):
        row = source.row_of(doc_id)
        if row is not None:
            rows.append(row)
            btexts.append(texts[i])
    bm25.bulk_build(rows, btexts)

    mesh = create_mesh(data=4, model=2)
    served = ShardedVectorStore(mesh, source, bm25_index=bm25)

    # dense parity with the single-chip exact scan
    q = embs[20:23]
    got = served.retrieve_by_embedding_batch(q, top_k=5, min_similarity=-1.0,
                                             quantized=False)
    want = source.retrieve_by_embedding_batch(q, top_k=5, min_similarity=-1.0,
                                              quantized=False)
    for qi in range(3):
        assert [d.doc_id for d, _ in got[qi]] == [d.doc_id for d, _ in want[qi]]

    # deleted doc is absent
    qdel = embs[7:8]
    hits = served.retrieve_by_embedding_batch(qdel, top_k=5, min_similarity=-1.0)
    assert ids[7] not in [d.doc_id for d, _ in hits[0]]

    # doc_level filter
    leaves = served.retrieve_by_embedding_batch(q[:1], top_k=10, min_similarity=-1.0,
                                                doc_level_filter="leaf")[0]
    assert leaves and all(d.doc_level == "leaf" for d, _ in leaves)

    # hybrid serving finds lexical matches
    hy = served.search_hybrid(q[:1], ["token3 shared"], top_k=5)[0]
    assert hy and any("token3" in d.content or "shared" in d.content for d, _ in hy)

    # writes land in the delta segment and are served immediately (the
    # explicit-refresh path still works too)
    source.upsert_batch([("brand new doc about qq17", {"doc_level": "leaf"},
                          rng.standard_normal(32))])
    served.refresh()
    assert served.count_documents() == source.count_documents()
    info = served.get_index_info()
    assert info["backend"] == "tpu-sharded" and info["mesh"]["data"] == 4


def test_orchestrator_runs_on_sharded_store(rng, tmp_path):
    """The full agentic pipeline serves from a ShardedVectorStore (pod-scale
    read replica) unchanged."""
    import json
    import jax.numpy as jnp
    from radiant_rag_tpu.config import (AppConfig, CrossEncoderConfig,
                                        EmbeddingConfig, IndexConfig,
                                        StrategyMemoryConfig)
    from radiant_rag_tpu.index.bm25 import PersistentBM25Index
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.llm.backends import MockLLMBackend
    from radiant_rag_tpu.llm.client import LLMClient
    from radiant_rag_tpu.models.bert import BertConfig
    from radiant_rag_tpu.models.cross_encoder import CrossEncoder
    from radiant_rag_tpu.models.embedder import Embedder
    from radiant_rag_tpu.models.registry import LocalNLPModels
    from radiant_rag_tpu.orchestrator import RAGOrchestrator
    from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

    cfg = AppConfig(
        index=IndexConfig(dim=32, initial_capacity=256, data_dir=str(tmp_path / "idx")),
        embedding=EmbeddingConfig(dim=32, num_layers=1, num_heads=2, hidden_dim=64,
                                  vocab_size=500, max_seq_len=32, batch_size=4),
        cross_encoder=CrossEncoderConfig(max_seq_len=32, batch_size=4),
        strategy_memory=StrategyMemoryConfig(path=str(tmp_path / "sm.json.gz")),
    )
    source = TpuVectorStore(dim=32, index_config=cfg.index)
    embedder = Embedder(cfg.embedding)
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=CrossEncoder(
        cfg.cross_encoder, bert_cfg=BertConfig(vocab_size=500, hidden_size=32,
                                               num_layers=1, num_heads=2,
                                               intermediate_size=64,
                                               dtype=jnp.float32)))
    docs = ["Comets are icy bodies orbiting the sun.",
            "Asteroids are rocky objects in the belt.",
            "Meteor showers occur when earth crosses debris trails."]
    embs = models.embed(docs)
    source.upsert_batch([(t, {"source": f"d{i}"}, embs[i]) for i, t in enumerate(docs)])
    bm25 = PersistentBM25Index(source, path=str(tmp_path / "b.json.gz"))
    bm25.build_from_store()

    served = ShardedVectorStore(create_mesh(data=4, model=2), source,
                                bm25_index=bm25.index)

    good = json.dumps({"ok": True, "confidence": 0.9, "relevance": 9,
                       "faithfulness": 9, "coverage": 8, "issues": [],
                       "should_retry": False, "issue_type": "none"})

    def responder(messages):
        last = messages[-1]["content"]
        if "Evaluate this answer" in last:
            return good
        if "atomic factual" in last or "Match each answer" in last:
            return "[]"
        if "Context:" in last and "Question:" in last:
            return "Comets are icy bodies [DOC 1]."
        return "{}"

    orch = RAGOrchestrator(cfg, served, bm25, models,
                           LLMClient(backend=MockLLMBackend(responder=responder)))
    # sharded store: a calibration-only searcher exists over the source
    # engine, but serving must NOT dispatch through it (pod path instead)
    assert orch._hybrid is not None and not orch._hybrid_serves
    result = orch.run("What are comets made of?")
    assert result.success and "icy" in result.answer
    assert result.docs


def test_multihost_shard_bounds():
    from radiant_rag_tpu.parallel.multihost import (create_multihost_mesh,
                                                    host_shard_bounds,
                                                    initialize_multihost)
    # single-process: full range, distributed init reports inactive
    assert initialize_multihost() is False or True  # must not raise
    s, e = host_shard_bounds(1000)
    assert (s, e) == (0, 1000)
    # explicit process grid: a partition with remainder spread to leaders
    spans = [host_shard_bounds(1003, p, 4) for p in range(4)]
    assert spans[0] == (0, 251) and spans[-1] == (753, 1003)
    assert all(spans[i][1] == spans[i + 1][0] for i in range(3))
    assert sum(e - s for s, e in spans) == 1003
    mesh = create_multihost_mesh()
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape[0] == 1  # single process -> one replica


def test_hard_negative_sampler_and_loss(rng):
    """BM25-mined hard negatives (VERDICT r2 #3): the sampler emits
    n_ids/n_mask of shape (B*H, S), negatives are real corpus docs distinct
    from the positives, and info_nce_loss consumes them with (B, B+B*H)
    logits."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.models.tokenizer import load_tokenizer
    from radiant_rag_tpu.parallel.data import ContrastivePairSampler
    from radiant_rag_tpu.parallel.train import info_nce_loss
    from radiant_rag_tpu.models.bert import BertEncoder, init_params

    r = np.random.default_rng(1)
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=256))
    docs = [(f"shared corpus topic {i % 4} unique token tok{i} extra words here", {},
             r.standard_normal(16)) for i in range(30)]
    store.upsert_batch(docs)
    bm25 = BM25Index()
    ids = store.list_doc_ids_with_embeddings()
    bm25.bulk_build([store.row_of(i) for i in ids],
                    [store.get_doc(i).content for i in ids])

    tok = load_tokenizer("", TINY.vocab_size)
    B, H = 4, 2
    sampler = ContrastivePairSampler.from_store(
        store, tok, bm25=bm25, batch_size=B, max_seq_len=32,
        n_hard_negatives=H, seed=0)
    batch = sampler.next_batch()
    assert batch["n_ids"].shape[0] == B * H
    assert batch["n_ids"].shape[1] == batch["q_ids"].shape[1]  # shared pad

    model = BertEncoder(TINY)
    params = init_params(TINY, seed=0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, metrics = info_nce_loss(model, params, jb)
    assert np.isfinite(float(loss))
    # hard negatives widen the softmax: loss must differ from in-batch-only
    jb2 = {k: v for k, v in jb.items() if not k.startswith("n_")}
    loss2, _ = info_nce_loss(model, params, jb2)
    assert float(loss) != pytest.approx(float(loss2))


def test_lr_schedule_state():
    """schedule_steps>0 builds a warmup+cosine optimizer that still steps."""
    mesh = create_mesh(data=4, model=2)
    state, model, tx, _ = make_train_state(TINY, mesh, learning_rate=1e-3,
                                           schedule_steps=50)
    step, place_batch = contrastive_train_step(model, tx, mesh)
    r = np.random.default_rng(0)
    batch = place_batch({
        "q_ids": r.integers(0, 256, (8, 16)).astype(np.int32),
        "q_mask": np.ones((8, 16), np.int32),
        "d_ids": r.integers(0, 256, (8, 16)).astype(np.int32),
        "d_mask": np.ones((8, 16), np.int32),
    })
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_embedder_restores_train_checkpoint(tmp_path, rng):
    """train -> fresh Embedder with checkpoint_dir picks up the trained
    params (the cross-process half of VERDICT r2 weak #6); incompatible
    architectures fall back to init."""
    import dataclasses

    from radiant_rag_tpu.config import EmbeddingConfig, IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.models.embedder import Embedder
    from radiant_rag_tpu.parallel.data import train_embedder

    r = np.random.default_rng(0)
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=256))
    store.upsert_batch([(f"doc {i} words {i%3} filler text", {}, r.standard_normal(16))
                        for i in range(20)])
    ck = str(tmp_path / "ckpt")
    cfg = EmbeddingConfig(dim=16, num_layers=1, num_heads=2, hidden_dim=32,
                          vocab_size=300, max_seq_len=32, batch_size=8,
                          dtype="float32", checkpoint_dir=ck)
    _, params = train_embedder(store, cfg, mesh=create_mesh(data=4, model=2),
                               steps=2, batch_size=8, checkpoint_dir=ck,
                               return_params=True, lr_schedule=False)
    emb = Embedder(cfg)
    got = jax.tree_util.tree_leaves(emb.params)[0]
    want = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # incompatible architecture (different width) ignores the checkpoint
    cfg2 = dataclasses.replace(cfg, num_layers=2)
    emb2 = Embedder(cfg2)
    assert len(jax.tree_util.tree_leaves(emb2.params)) != len(
        jax.tree_util.tree_leaves(params))


def test_invalidate_calibration(rng):
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.engine import DeviceVectorIndex
    from radiant_rag_tpu.index.hybrid import HybridSearcher

    eng = DeviceVectorIndex(16, initial_capacity=256)
    hy = HybridSearcher(eng, BM25Index())
    hy.leg_weights = np.asarray([0.9, 0.1], np.float32)
    hy._calibrated_at = 100
    assert not hy.needs_calibration() or eng.count > 120
    hy.invalidate_calibration()
    assert hy.needs_calibration()
    np.testing.assert_allclose(hy.leg_weights, [0.5, 0.5])


def test_sharded_store_incremental_ingest(rng):
    """VERDICT r2 #8: appends while serving become retrievable WITHOUT a
    full re-shard (delta segment), deletes tombstone base rows, and
    crossing the rebase fraction folds the delta into a fresh base."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

    mesh = create_mesh(data=4, model=2)
    dim, n = 32, 120
    source = TpuVectorStore(dim=dim, index_config=IndexConfig(dim=dim, initial_capacity=256))
    embs = rng.standard_normal((n, dim)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    ids = source.upsert_batch([
        (f"base doc {i} with marker base{i}", {"doc_level": "leaf"}, embs[i])
        for i in range(n)])
    bm25 = BM25Index()
    bm25.bulk_build([source.row_of(i) for i in ids],
                    [source.get_doc(i).content for i in ids])
    served = ShardedVectorStore(mesh, source, bm25_index=bm25,
                                delta_rebase_fraction=0.5)
    base_rows_before = served._base_rows

    # append while serving: new docs retrievable dense + hybrid, no re-shard
    new_embs = rng.standard_normal((8, dim)).astype(np.float32)
    new_embs /= np.linalg.norm(new_embs, axis=1, keepdims=True)
    new_ids = served.upsert_batch([
        (f"fresh doc {i} with rare term zzfresh{i}", {"doc_level": "leaf"}, new_embs[i])
        for i in range(8)])
    assert served._base_rows == base_rows_before  # no rebase happened
    assert served.delta_size == 8
    assert served.count_documents() == n + 8

    hits = served.retrieve_by_embedding_batch(new_embs[:2], top_k=5,
                                              min_similarity=-1.0)
    assert new_ids[0] in [d.doc_id for d, _ in hits[0]]
    assert new_ids[1] in [d.doc_id for d, _ in hits[1]]

    hy = served.search_hybrid(new_embs[2:3], ["zzfresh2"], top_k=5)[0]
    assert new_ids[2] in [d.doc_id for d, _ in hy]

    # delete a BASE doc: tombstoned out of results without re-shard
    served.delete_doc(ids[5])
    assert served._base_rows == base_rows_before
    hits = served.retrieve_by_embedding_batch(embs[5:6], top_k=5,
                                              min_similarity=-1.0)
    assert ids[5] not in [d.doc_id for d, _ in hits[0]]

    # delete a DELTA doc
    served.delete_doc(new_ids[0])
    hits = served.retrieve_by_embedding_batch(new_embs[:1], top_k=5,
                                              min_similarity=-1.0)
    assert new_ids[0] not in [d.doc_id for d, _ in hits[0]]

    # crossing the rebase fraction folds the delta into the base
    many = rng.standard_normal((70, dim)).astype(np.float32)
    many /= np.linalg.norm(many, axis=1, keepdims=True)
    more_ids = served.upsert_batch([
        (f"bulk doc {i} term qbulk{i}", {"doc_level": "leaf"}, many[i])
        for i in range(70)])
    assert served._base_rows > base_rows_before  # rebased
    assert served.delta_size == 0
    # and everything is still retrievable from the new base
    hits = served.retrieve_by_embedding_batch(many[10:11], top_k=5,
                                              min_similarity=-1.0)
    assert more_ids[10] in [d.doc_id for d, _ in hits[0]]
    hy = served.search_hybrid(new_embs[3:4], ["zzfresh3"], top_k=5)[0]
    assert new_ids[3] in [d.doc_id for d, _ in hy]


def test_sharded_fusion_carries_calibration(rng):
    """Pod serving honors the calibrated fusion config: with a garbage dense
    leg demoted by set_fusion, the fused head tracks bm25 on BOTH the pure-
    base device path and the delta host-merge path (previously both were
    hard-wired equal RRF — the exact failure calibration exists to prevent),
    and refresh() re-installs the config."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

    mesh = create_mesh(data=4, model=2)
    dim, n = 32, 96
    source = TpuVectorStore(dim=dim, index_config=IndexConfig(dim=dim, initial_capacity=256))
    embs = rng.standard_normal((n, dim)).astype(np.float32)  # random = garbage dense
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    texts = [f"unique{i} subject{i % 7} verb{i % 11}" for i in range(n)]
    ids = source.upsert_batch([(texts[i], {"doc_level": "leaf"}, embs[i])
                               for i in range(n)])
    bm25 = BM25Index(sketch_dim=256)
    bm25.bulk_build([source.row_of(i) for i in ids], texts)
    served = ShardedVectorStore(mesh, source, bm25_index=bm25,
                                delta_rebase_fraction=0.9)
    served.set_fusion("confidence", [0.005, 0.995])

    q = rng.standard_normal((1, dim)).astype(np.float32)
    q /= np.linalg.norm(q)
    # pure base (device fusion): fused head == bm25's lexical match
    hy = served.search_hybrid(q, ["unique5 subject5"], top_k=5)[0]
    assert hy and hy[0][0].doc_id == ids[5]

    # stage a delta append -> host-merge fusion path
    new_emb = rng.standard_normal((1, dim)).astype(np.float32)
    new_emb /= np.linalg.norm(new_emb)
    served.upsert_batch([("delta doc rare zzdelta0", {"doc_level": "leaf"},
                          new_emb[0])])
    assert served.delta_size == 1
    hy = served.search_hybrid(q, ["unique5 subject5"], top_k=5)[0]
    assert hy and hy[0][0].doc_id == ids[5]

    # refresh keeps the calibrated config installed
    served.refresh()
    assert served._hybrid.fusion_mode == "confidence"
    hy = served.search_hybrid(q, ["unique7 subject0"], top_k=5)[0]
    assert hy and hy[0][0].doc_id == ids[7]

    # score mode compiles and runs on the pod program too
    served.set_fusion("score", [0.3, 0.7])
    hy = served.search_hybrid(q, ["unique9 subject2"], top_k=5)[0]
    assert hy and ids[9] in [d.doc_id for d, _ in hy]


def test_cross_encoder_sampler_and_train(rng):
    """Cross-encoder trainer (VERDICT r4 #2): labeled (query, doc) pair
    batches with BM25 hard negatives; pointwise BCE under the dp x tp mesh;
    trained params slot straight into models.CrossEncoder."""
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.models.bert import BertConfig
    from radiant_rag_tpu.models.cross_encoder import CrossEncoder
    from radiant_rag_tpu.models.tokenizer import load_tokenizer
    from radiant_rag_tpu.parallel.data import (
        CrossEncoderPairSampler, train_cross_encoder,
    )

    texts = [f"document number {i} about retrieval topic {i % 7} and "
             f"details {i}" for i in range(60)]
    bm25 = BM25Index()
    bm25.bulk_build(list(range(60)), texts)
    tok = load_tokenizer("", 300)
    sampler = CrossEncoderPairSampler(
        texts, tok, batch_size=16, max_seq_len=32, seed=0,
        bm25=bm25, rows=list(range(60)), n_hard_negatives=2,
        n_random_negatives=1)
    batch = sampler.next_batch()
    assert batch["ids"].shape[0] == sampler.batch_size
    assert batch["labels"].sum() == sampler.n_groups  # one positive/group
    assert set(batch) == {"ids", "mask", "type_ids", "labels"}

    bert_cfg = BertConfig(vocab_size=300, hidden_size=16, num_layers=1,
                          num_heads=2, intermediate_size=32,
                          dtype=jnp.float32)
    metrics, params = train_cross_encoder(
        texts, bert_cfg=bert_cfg, mesh=create_mesh(data=4, model=2),
        steps=3, batch_size=16, log_every=1, sampler=sampler,
        return_params=True)
    assert np.isfinite(metrics["loss"])
    ce = CrossEncoder(bert_cfg=bert_cfg, params=params)
    ranked = ce.rerank("retrieval topic 3", [texts[3], texts[10]], top_k=2)
    assert len(ranked) == 2 and all(np.isfinite(s) for _, s in ranked)
