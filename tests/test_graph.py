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


def test_graph_search_ef_improves_recall(rng):
    """Wider beam = higher recall (ef is the runtime quality knob,
    reference efR semantics)."""
    n, d = 1500, 32
    vecs = _corpus(rng, n, d)
    gi = GraphIndex(degree=8, n_long_edges=2, steps=6)
    gi.build(vecs)
    queries = _corpus(rng, 24, d)
    sims = queries @ vecs.T

    def recall(ef):
        _, i = gi.search(jnp.asarray(vecs), queries, k=10, ef=ef)
        rs = []
        for qi in range(len(queries)):
            true10 = set(np.argsort(-sims[qi])[:10])
            rs.append(len(set(int(x) for x in i[qi] if x >= 0) & true10) / 10)
        return float(np.mean(rs))

    r_small, r_big = recall(8), recall(96)
    assert r_big >= r_small
    assert r_big >= 0.85


def test_graph_build_excludes_invalid_rows(rng):
    """Edges must not point at invalid rows; search over the masked graph
    returns none of them (delete-before-rebuild consistency)."""
    n, d = 600, 32
    vecs = _corpus(rng, n, d)
    valid = np.ones(n, bool)
    valid[100:200] = False
    gi = GraphIndex(degree=8, steps=6)
    gi.build(vecs, valid=valid)
    adj = np.asarray(gi.neighbors)[:, :8]  # knn part (long edges are random)
    dead_targets = set(range(100, 200))
    live_rows = np.nonzero(valid)[0]
    hit = sum(len(set(adj[r]) & dead_targets) for r in live_rows[:50])
    assert hit == 0
    # entry points drawn from the valid pool only
    assert not (set(int(x) for x in np.asarray(gi.entry_points)) & dead_targets)


def test_graph_search_k_exceeds_matches(rng):
    """k larger than the reachable set pads with -1 rows, never junk."""
    n, d = 300, 32
    vecs = _corpus(rng, n, d)
    gi = GraphIndex(degree=8, steps=4)
    gi.build(vecs)
    mask = np.zeros(n, bool)
    mask[:5] = True  # only 5 valid docs
    s, i = gi.search(jnp.asarray(vecs), vecs[:2], k=10, ef=32,
                     mask=jnp.asarray(mask))
    for row in i:
        real = [int(x) for x in row if x >= 0]
        assert set(real) <= set(range(5))
    # padded slots are exactly -1
    assert (i >= -1).all()


def test_store_graph_auto_extends_after_growth(rng):
    """Appending rows after build leaves the graph momentarily stale; the
    next graph-mode search inserts them incrementally (HNSW-insert analog)
    so new docs are retrievable without a rebuild."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dim=32, index_config=IndexConfig(
        dim=32, initial_capacity=256, use_graph=True, graph_degree=8))
    docs = [(f"doc {i}", {}, rng.standard_normal(32)) for i in range(120)]
    store.upsert_batch(docs)
    store.build_graph()
    built_before = store.engine.graph.built_rows
    more = [(f"late doc {i}", {}, rng.standard_normal(32)) for i in range(30)]
    store.upsert_batch(more)
    assert store.engine.graph.built_rows == built_before  # stale until search
    q = np.asarray(more[7][2])
    hits = store.retrieve_by_embedding(q, top_k=3)
    assert store.engine.graph.built_rows >= built_before + 30  # auto-extended
    assert hits and hits[0][0].content == "late doc 7"


def test_graph_incremental_add_recall(rng):
    """Incrementally inserted rows are found with recall comparable to a
    full rebuild (out-edges are exact; back-edges make them reachable)."""
    n0, n1, d = 2000, 500, 48
    vecs = _corpus(rng, n0 + n1, d)
    gi = GraphIndex(degree=16, n_long_edges=4, n_entry_points=16, steps=8)
    gi.build(vecs[:n0])
    gi.add(vecs, n0, n1)
    assert gi.built_rows == n0 + n1
    assert 0.0 < gi.stale_fraction < 0.3

    gi_full = GraphIndex(degree=16, n_long_edges=4, n_entry_points=16, steps=8)
    gi_full.build(vecs)

    # queries aimed at the NEW region: noisy copies of new vectors
    q = vecs[n0 : n0 + 32] + 0.1 * rng.standard_normal((32, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sims = q @ vecs.T

    def recall(g):
        _, i = g.search(jnp.asarray(vecs), q, k=10, ef=96)
        rs = []
        for qi in range(len(q)):
            true10 = set(np.argsort(-sims[qi])[:10])
            rs.append(len(set(int(x) for x in i[qi] if x >= 0) & true10) / 10)
        return float(np.mean(rs))

    r_inc, r_full = recall(gi), recall(gi_full)
    assert r_inc >= 0.8, (r_inc, r_full)
    assert r_inc >= r_full - 0.1, (r_inc, r_full)


def test_graph_incremental_back_edges(rng):
    """Existing nodes gain edges pointing at close new nodes (weakest-edge
    replacement), so new nodes are reachable from the old graph region."""
    n0, d = 400, 32
    vecs0 = _corpus(rng, n0, d)
    gi = GraphIndex(degree=8, n_long_edges=2, steps=6)
    gi.build(vecs0)
    # new nodes = tiny perturbations of existing ones -> must become their
    # nearest neighbors and claim a back-edge
    new = vecs0[:20] + 0.01 * rng.standard_normal((20, d)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    allv = np.concatenate([vecs0, new])
    gi.add(allv, n0, 20)
    adj = np.asarray(gi.neighbors)
    back = sum(1 for r in range(20) if (adj[r, :8] >= n0).any())
    assert back >= 15, back  # near-duplicates displace the weakest edge
    # and the new nodes' own out-edges include their source row
    out_hits = sum(1 for j in range(20) if j in set(adj[n0 + j, :8]))
    assert out_hits >= 15, out_hits


def test_graph_incremental_respects_invalid_rows(rng):
    """Out-edges of incrementally added nodes never point at invalid rows."""
    n0, n1, d = 300, 60, 32
    vecs = _corpus(rng, n0 + n1, d)
    valid = np.ones(n0 + n1, bool)
    valid[50:100] = False
    gi = GraphIndex(degree=8, n_long_edges=2, steps=6)
    gi.build(vecs[:n0], valid=valid[:n0])
    gi.add(vecs, n0, n1, valid=valid)
    adj = np.asarray(gi.neighbors)[n0:, :8]
    assert not (set(adj.reshape(-1).tolist()) & set(range(50, 100)))


def test_engine_extend_graph_rebuilds_past_threshold(rng):
    """Once incremental growth exceeds max_stale_fraction, extend_graph
    escalates to a full rebuild (resetting stale_fraction)."""
    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    d = 32
    eng = DeviceVectorIndex(d, initial_capacity=256)
    v = _corpus(rng, 80, d)
    eng.append(v, np.zeros(80, np.int8), np.zeros(80, np.int32),
               np.full(80, 10, np.float32))
    eng.build_graph(degree=8)
    assert eng.graph.built_rows == 80
    # small growth -> incremental
    v2 = _corpus(rng, 20, d)
    eng.append(v2, np.zeros(20, np.int8), np.zeros(20, np.int32),
               np.full(20, 10, np.float32))
    eng.extend_graph()
    assert eng.graph.built_rows == 100
    assert eng.graph.stale_fraction > 0
    # large growth -> full rebuild
    v3 = _corpus(rng, 200, d)
    eng.append(v3, np.zeros(200, np.int8), np.zeros(200, np.int32),
               np.full(200, 10, np.float32))
    eng.extend_graph()
    assert eng.graph.built_rows == 300
    assert eng.graph.stale_fraction == 0.0


def test_nn_descent_edges_near_exact(rng):
    """NN-descent converges to >=85% agreement with the exact KNN graph on a
    clustered corpus (the regime the graph engine exists for)."""
    from radiant_rag_tpu.index.graph import nn_descent_graph

    n, d = 3000, 48
    vecs = _corpus(rng, n, d)
    approx = nn_descent_graph(vecs, degree=8, n_long_edges=0, iters=10,
                              block=1024, seed=0)
    exact = build_knn_graph(vecs, degree=8, n_long_edges=0, block=1024)
    agree = np.mean([
        len(set(approx[i]) & set(exact[i])) / 8 for i in range(0, n, 7)])
    assert agree >= 0.85, agree


def test_nn_descent_search_recall_matches_exact_build(rng):
    """Beam-search recall over the NN-descent graph matches the exact-built
    graph within a small margin."""
    from radiant_rag_tpu.index.graph import nn_descent_graph

    n, d = 2000, 48
    vecs = _corpus(rng, n, d)
    gi_nd = GraphIndex(degree=16, n_long_edges=4, n_entry_points=16, steps=8)
    gi_nd.build(vecs, method="nn_descent")
    gi_ex = GraphIndex(degree=16, n_long_edges=4, n_entry_points=16, steps=8)
    gi_ex.build(vecs, method="exact")
    queries = _corpus(rng, 16, d)
    sims = queries @ vecs.T

    def recall(g):
        _, i = g.search(jnp.asarray(vecs), queries, k=10, ef=64)
        rs = []
        for qi in range(16):
            true10 = set(np.argsort(-sims[qi])[:10])
            rs.append(len(set(int(x) for x in i[qi] if x >= 0) & true10) / 10)
        return float(np.mean(rs))

    r_nd, r_ex = recall(gi_nd), recall(gi_ex)
    assert r_nd >= r_ex - 0.05, (r_nd, r_ex)
    assert r_nd >= 0.8, r_nd


def test_nn_descent_respects_invalid_rows(rng):
    from radiant_rag_tpu.index.graph import nn_descent_graph

    n, d = 800, 32
    vecs = _corpus(rng, n, d)
    valid = np.ones(n, bool)
    valid[200:300] = False
    adj = nn_descent_graph(vecs, degree=8, n_long_edges=2, iters=6,
                           block=256, valid=valid)
    live = np.nonzero(valid)[0]
    dead = set(range(200, 300))
    hits = sum(len(set(adj[i, :8].tolist()) & dead) for i in live[:100])
    assert hits == 0


def test_cluster_polish_recovers_underconverged_descent(rng):
    """The 1M edge study's fix (index/graph._cluster_polish): an
    under-converged descent's adjacency must jump toward the exact graph
    after one within-partition exact pass (chip A/B at 50k: 0.21 -> 0.79)."""
    from radiant_rag_tpu.index.graph import nn_descent_graph

    n, d = 3000, 48
    vecs = _corpus(rng, n, d)

    def agreement(adj):
        sims = vecs[:256] @ vecs.T
        np.fill_diagonal(sims[:, :256], -1)
        agree = 0
        for i in range(256):
            true = set(np.argsort(-sims[i])[:8])
            agree += len(true & set(int(x) for x in adj[i, :8] if x >= 0))
        return agree / (256 * 8)

    raw = nn_descent_graph(vecs, degree=8, n_long_edges=0, iters=1,
                           block=512, polish=False)
    polished = nn_descent_graph(vecs, degree=8, n_long_edges=0, iters=1,
                                block=512, polish=True)
    a_raw, a_pol = agreement(raw), agreement(polished)
    assert a_pol > a_raw + 0.1, (a_raw, a_pol)
    assert a_pol >= 0.8, a_pol
