"""Graph index: KNN-graph build + beam search recall vs brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiant_rag_tpu.index.graph import GraphIndex, build_knn_graph, graph_search


def _corpus(rng, n, d):
    # clustered corpus: graph search needs local structure to navigate
    centers = rng.standard_normal((16, d)).astype(np.float32)
    v = centers[rng.integers(0, 16, n)] + 0.4 * rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_knn_graph_edges_are_nearest(rng):
    vecs = _corpus(rng, 500, 32)
    adj = build_knn_graph(vecs, degree=8, n_long_edges=2, block=256)
    assert adj.shape == (500, 10)
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -2)
    for row in (0, 123, 499):
        true8 = set(np.argsort(-sims[row])[:8])
        assert len(set(adj[row, :8]) & true8) >= 7  # exact modulo ties
        assert row not in set(adj[row, :8])  # no self edges


def test_graph_search_recall(rng):
    n, d = 2000, 48
    vecs = _corpus(rng, n, d)
    gi = GraphIndex(degree=16, n_long_edges=4, n_entry_points=16, steps=8)
    gi.build(vecs)
    queries = _corpus(rng, 16, d)
    s, i = gi.search(jnp.asarray(vecs), queries, k=10, ef=64)
    sims = queries @ vecs.T
    recalls = []
    for qi in range(16):
        true10 = set(np.argsort(-sims[qi])[:10])
        got = set(int(x) for x in i[qi] if x >= 0)
        recalls.append(len(got & true10) / 10)
    assert np.mean(recalls) >= 0.85, np.mean(recalls)
    # scores are true cosines of returned ids
    for qi in range(3):
        for x, sc in zip(i[qi], s[qi]):
            if x >= 0:
                np.testing.assert_allclose(sc, sims[qi, int(x)], rtol=1e-4)


def test_graph_search_respects_mask(rng):
    n, d = 400, 32
    vecs = _corpus(rng, n, d)
    gi = GraphIndex(degree=8, steps=6)
    gi.build(vecs)
    mask = np.ones(n, bool)
    banned = set(range(0, 50))
    mask[:50] = False
    s, i = gi.search(jnp.asarray(vecs), vecs[:4], k=10, ef=32, mask=jnp.asarray(mask))
    got = set(int(x) for row in i for x in row if x >= 0)
    assert not (got & banned)


def test_store_graph_mode(rng):
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dim=32, index_config=IndexConfig(
        dim=32, initial_capacity=256, use_graph=True, graph_degree=8))
    docs = [(f"doc {i}", {}, rng.standard_normal(32)) for i in range(150)]
    store.upsert_batch(docs)
    assert store._default_mode() != "graph"  # not built yet -> flat
    store.build_graph()
    assert store._default_mode() == "graph"
    q = np.asarray(docs[42][2])
    hits = store.retrieve_by_embedding(q, top_k=5)
    assert hits and hits[0][0].content == "doc 42"
    # deletes respected through graph mask
    store.delete_doc(hits[0][0].doc_id)
    hits2 = store.retrieve_by_embedding(q, top_k=5)
    assert all(d.content != "doc 42" for d, _ in hits2)
