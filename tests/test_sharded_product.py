"""Sharded pod backend as a product surface (VERDICT r3 #6).

`index.backend: "sharded"` must work through the whole product stack on the
virtual 8-device CPU mesh: factory dispatch, app construction (BM25 attach),
hybrid search through the collective path, HTTP-handler serving, concurrent
append during serving, and calibrated-fusion propagation onto the pod store.
Reference analog: every backend is user-selectable config
(`/root/reference/radiant/storage/factory.py:40-61`)."""

import threading

import numpy as np
import pytest

from radiant_rag_tpu.config import (
    AppConfig, EmbeddingConfig, IndexConfig, LLMConfig, MeshConfig,
)
from radiant_rag_tpu.index.factory import (
    create_vector_store, get_available_backends, validate_backend_config,
)


def _cfg(tmp_path, **mesh_kw):
    return AppConfig(
        index=IndexConfig(backend="sharded", dim=32, initial_capacity=128,
                          data_dir=str(tmp_path / "idx")),
        embedding=EmbeddingConfig(preset="none", dim=32, num_layers=1,
                                  num_heads=2, hidden_dim=64, vocab_size=300,
                                  max_seq_len=32, checkpoint_dir=""),
        llm=LLMConfig(backend="mock"),
        mesh=MeshConfig(**mesh_kw) if mesh_kw else MeshConfig(),
    )


def test_factory_dispatches_sharded(tmp_path):
    from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

    assert "sharded" in get_available_backends()
    cfg = _cfg(tmp_path)
    assert validate_backend_config(cfg)["valid"]
    store = create_vector_store(cfg)
    assert isinstance(store, ShardedVectorStore)
    # default mesh: all 8 virtual devices on the data axis
    assert int(np.prod(store.mesh.devices.shape)) == 8


def test_app_hybrid_search_over_sharded_backend(tmp_path):
    """Full app stack: ingest -> hybrid search runs the pod collective path
    (orchestrator._hybrid exists for calibration but must not serve)."""
    from radiant_rag_tpu.app import RadiantTPU

    app = RadiantTPU(config=_cfg(tmp_path))
    assert hasattr(app.store, "search_hybrid")
    assert app._fused_searcher() is None  # pod store: no single-device dispatch
    texts = ["TPU systolic arrays multiply bfloat16 matrices.",
             "Hybrid retrieval fuses dense embeddings with BM25 scores.",
             "Sharded stores merge per-shard top-k with collectives."]
    paths = []
    for i, t in enumerate(texts):
        f = tmp_path / f"doc{i}.txt"
        f.write_text(t)
        paths.append(str(f))
    out = app.ingest_documents(paths)
    assert out["chunks_ingested"] >= 3
    hits = app.search("hybrid dense BM25 fusion", mode="hybrid", top_k=3)
    # membership, not rank-1: the dim-32 encoder is random-init here, so the
    # dense leg contributes noise — BM25 guarantees the doc reaches the pool
    assert any("Hybrid retrieval" in d.content for d, _ in hits)
    # per-leg modes ride the pod store too
    assert app.search("sharded collectives", mode="dense", top_k=2)
    assert app.search("systolic bfloat16", mode="bm25", top_k=2)


def test_serving_handler_with_concurrent_append(tmp_path):
    """One HTTP-handler request over the sharded store, while a writer
    appends concurrently (base+delta: new docs become searchable without a
    re-shard; serving never blocks on it)."""
    from radiant_rag_tpu.app import RadiantTPU
    from radiant_rag_tpu.server import RagAPI

    app = RadiantTPU(config=_cfg(tmp_path))
    f = tmp_path / "base.txt"
    f.write_text("\n\n".join(f"base document number {i} about retrieval "
                             f"topic {i % 3}" for i in range(8)))
    app.ingest_documents([str(f)])
    api = RagAPI(app, coalesce=False)

    errors = []

    def writer():
        try:
            emb = app.local_models.embed(["fresh pod delta document about "
                                          "quantized scanning"])[0]
            app.store.upsert_batch([
                ("fresh pod delta document about quantized scanning",
                 {"doc_level": "leaf"}, emb)])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    t = threading.Thread(target=writer)
    t.start()
    code, body = api.handle("POST", "/search",
                            {"query": "retrieval topic", "mode": "hybrid"})
    t.join()
    assert not errors
    assert code == 200 and body["hits"]
    # the concurrently appended doc is now retrievable via the delta segment
    code, body = api.handle("POST", "/search",
                            {"query": "quantized scanning delta", "mode": "hybrid"})
    assert code == 200
    assert any("fresh pod delta" in h["content"] for h in body["hits"])
    code, stats = api.handle("GET", "/stats", {})
    assert code == 200
    api.close()


def test_calibrated_fusion_reaches_pod_store(tmp_path):
    """calibrate_pod_fusion runs probes over the source engine and installs
    the selected mode+weights on the sharded store (advisor r3 finding)."""
    from radiant_rag_tpu.app import RadiantTPU

    app = RadiantTPU(config=_cfg(tmp_path))
    f = tmp_path / "c.txt"
    f.write_text("\n\n".join(
        f"calibration corpus document {i} with shared technical vocabulary "
        f"about indexing subsystem {i % 4}" for i in range(12)))
    app.ingest_documents([str(f)])
    app.search("indexing subsystem vocabulary", mode="hybrid", top_k=3)
    hy = app.orchestrator._hybrid
    assert hy is not None and not app.orchestrator._hybrid_serves
    assert hy.last_calibration is not None
    w = np.asarray(app.store._fusion_weights, np.float64)
    assert app.store._fusion_mode == hy.fusion_mode
    np.testing.assert_allclose(w, np.asarray(hy.leg_weights, np.float64),
                               rtol=1e-5)


def test_sharded_persistence_roundtrip(tmp_path):
    """auto-persist writes through to the source store; a fresh app over the
    same data_dir reloads and serves the corpus from the sharded base."""
    from radiant_rag_tpu.app import RadiantTPU

    cfg = _cfg(tmp_path)
    app = RadiantTPU(config=cfg)
    f = tmp_path / "p.txt"
    f.write_text("persistent sharded corpus about collective top-k merges")
    app.ingest_documents([str(f)])

    app2 = RadiantTPU(config=cfg)
    assert app2.store.count_documents() >= 1
    hits = app2.search("collective top-k merges", mode="hybrid", top_k=2)
    assert hits and "collective top-k" in hits[0][0].content
