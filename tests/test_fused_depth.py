"""Candidate-pool deepening (`fused_depth`) — round 4.

The rerank decomposition study (BENCH_NOTES round 4) measured that fusing
the legs at depth 32 and truncating to top-10 gains +0.047 MRR / +0.05
hit@10 over fusing at depth 10 on the 100k real-text corpus — the entire
"rerank stage" win minus the CE's +0.0025. This ships as a product default
(`retrieval.fused_depth`, -1 = auto 4 x fused_top_k). These tests pin the
exact semantics: depth mode == explicitly-deep legs + fused truncation,
with returned legs sliced back to their own k's.
"""

import numpy as np
import pytest

from radiant_rag_tpu.index.bm25 import BM25Index
from radiant_rag_tpu.index.engine import DeviceVectorIndex
from radiant_rag_tpu.index.hybrid import HybridSearcher, resolve_fused_depth


def _mk(n=300, dim=32, seed=0, sketch=True):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    eng = DeviceVectorIndex(dim, initial_capacity=n)
    eng.append(vecs, np.zeros(n, np.int8), np.zeros(n, np.int32),
               np.full(n, 8.0, np.float32))
    words = [f"w{i}" for i in range(120)]
    texts = [" ".join(rng.choice(words, 8)) for _ in range(n)]
    bm = BM25Index(sketch_dim=64 if sketch else 0)
    bm.bulk_build(list(range(n)), texts)
    s = HybridSearcher(eng, bm)
    queries = vecs[rng.integers(0, n, 6)] + 0.2 * rng.standard_normal(
        (6, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_texts = [texts[i] for i in range(6)]
    return s, queries, q_texts


@pytest.mark.parametrize("bm25_mode", ["pages", "sketch"])
def test_depth_equals_explicit_deep_legs(bm25_mode):
    s, q, qt = _mk()
    k, depth = 5, 20
    deep = s.search_rows(q, qt, dense_k=k, bm25_k=k, fused_k=k,
                         bm25_mode=bm25_mode, fusion="equal",
                         fused_depth=depth)
    oracle = s.search_rows(q, qt, dense_k=depth, bm25_k=depth, fused_k=k,
                           bm25_mode=bm25_mode, fusion="equal",
                           fused_depth=0)
    np.testing.assert_array_equal(deep["fused"][1], oracle["fused"][1])
    np.testing.assert_allclose(deep["fused"][0], oracle["fused"][0],
                               rtol=1e-5)
    # legs come back at their own k = the deep legs' heads
    for leg in ("dense", "bm25"):
        assert deep[leg][1].shape == (q.shape[0], k)
        np.testing.assert_array_equal(deep[leg][1],
                                      oracle[leg][1][:, :k])


def test_depth_zero_is_identity():
    s, q, qt = _mk()
    a = s.search_rows(q, qt, dense_k=5, bm25_k=5, fused_k=5,
                      fusion="equal", fused_depth=0)
    b = s.search_rows(q, qt, dense_k=5, bm25_k=5, fused_k=5, fusion="equal")
    np.testing.assert_array_equal(a["fused"][1], b["fused"][1])


def test_default_attr_is_used():
    s, q, qt = _mk()
    s.default_fused_depth = 20
    via_attr = s.search_rows(q, qt, dense_k=5, bm25_k=5, fused_k=5,
                             fusion="equal")
    explicit = s.search_rows(q, qt, dense_k=5, bm25_k=5, fused_k=5,
                             fusion="equal", fused_depth=20)
    np.testing.assert_array_equal(via_attr["fused"][1], explicit["fused"][1])


def test_depth_not_below_legs_is_off():
    """pool <= max(dense_k, bm25_k) must not change anything."""
    s, q, qt = _mk()
    a = s.search_rows(q, qt, dense_k=10, bm25_k=10, fused_k=10,
                      fusion="equal", fused_depth=8)
    b = s.search_rows(q, qt, dense_k=10, bm25_k=10, fused_k=10,
                      fusion="equal", fused_depth=0)
    np.testing.assert_array_equal(a["fused"][1], b["fused"][1])


def test_depth_widens_fused_candidates():
    """A doc at leg rank 11-20 in both legs can enter the fused top-k only
    under deepening — verify deepening recovers at least the targets the
    shallow fusion misses on a case where legs disagree at the head."""
    s, q, qt = _mk(seed=3)
    shallow = s.search_rows(q, qt, dense_k=5, bm25_k=5, fused_k=5,
                            fusion="equal", fused_depth=0)
    deep = s.search_rows(q, qt, dense_k=5, bm25_k=5, fused_k=5,
                         fusion="equal", fused_depth=40)
    # same output shape, and the deep fused set is drawn from a strictly
    # larger candidate pool — at minimum it differs on some query OR equals
    # shallow when the heads already agree; what must hold: the dense leg's
    # rank-1 (the strongest signal) stays in the deep fused top-5
    assert deep["fused"][1].shape == shallow["fused"][1].shape
    d1 = s.search_rows(q, qt, dense_k=1, bm25_k=1, fused_k=1,
                       fusion="equal", fused_depth=0)
    for qi in range(q.shape[0]):
        top_dense = d1["dense"][1][qi, 0]
        if top_dense >= 0:
            assert top_dense in set(deep["fused"][1][qi].tolist() +
                                    shallow["fused"][1][qi].tolist())


def test_resolve_fused_depth():
    class C:
        fused_top_k = 15
        fused_depth = -1

    assert resolve_fused_depth(C()) == 60
    C.fused_depth = 0
    assert resolve_fused_depth(C()) == 0
    C.fused_depth = 32
    assert resolve_fused_depth(C()) == 32


def test_config_default_auto():
    from radiant_rag_tpu.config import RetrievalConfig

    cfg = RetrievalConfig()
    assert cfg.fused_depth == -1
    assert resolve_fused_depth(cfg) == 4 * cfg.fused_top_k
