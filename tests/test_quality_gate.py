"""Quality regression gate (VERDICT r2 #5): fusion, calibration, and
quantization regressions must FAIL CI instead of shipping behind green unit
tests. The reference has no retrieval-quality harness at all (SURVEY.md §4);
`tools/quality_harness.py` produces the full report — these tests pin its
three load-bearing invariants on a small CPU corpus:

1. calibrated hybrid MRR >= max(per-leg MRR) - EPS — calibration exists to
   keep a weak leg from dragging fusion below the best leg (round-2 fix:
   equal-weight RRF with a random-init dense leg scored 0.355 vs bm25's
   0.728; calibration restored 0.728)
2. quantized two-stage retrieval (int8 + fp32 rescore, the DEFAULT serving
   path) recalls the exact scan's top-k within EPS
3. cross-query RRF ordering: consensus across queries outranks a single
   first place (reference `orchestrator.py:1147-1196` semantics)
"""

import numpy as np
import pytest

from radiant_rag_tpu.config import EmbeddingConfig, IndexConfig
from radiant_rag_tpu.index.bm25 import BM25Index
from radiant_rag_tpu.index.hybrid import HybridSearcher
from radiant_rag_tpu.index.store import TpuVectorStore
from radiant_rag_tpu.models.embedder import Embedder

DIM = 48
N_DOCS = 400
N_QUERIES = 60
TOP_K = 10
EPS = 0.02

TOPICS = {
    "astronomy": "star planet orbit telescope galaxy nebula comet asteroid",
    "biology": "cell protein enzyme membrane nucleus mitochondria ribosome dna",
    "computing": "processor memory cache compiler kernel thread scheduler bus",
    "cooking": "flour butter oven dough yeast simmer saute braise seasoning",
    "geology": "mineral sediment tectonic magma erosion basalt granite fossil",
}


@pytest.fixture(scope="module")
def corpus_env():
    rng = np.random.default_rng(7)
    names = list(TOPICS)
    docs = []
    for i in range(N_DOCS):
        vocab = TOPICS[names[i % len(names)]].split()
        words = list(rng.choice(vocab, size=24)) + [f"detail{i}", f"entity{i % 37}"]
        rng.shuffle(words)
        docs.append(f"passage {i}: " + " ".join(words))

    embedder = Embedder(EmbeddingConfig(
        dim=DIM, num_layers=2, num_heads=4, hidden_dim=DIM * 2,
        vocab_size=4096, max_seq_len=48, batch_size=64, dtype="float32",
        checkpoint_dir=""))
    store = TpuVectorStore(dim=DIM, index_config=IndexConfig(
        dim=DIM, initial_capacity=N_DOCS))
    embs = embedder.embed(docs)
    store.upsert_batch([(t, {}, embs[i]) for i, t in enumerate(docs)])
    bm25 = BM25Index(sketch_dim=512)
    rows = [store.row_of(store.make_doc_id(t, {})) for t in docs]
    bm25.bulk_build(rows, docs)
    searcher = HybridSearcher(store.engine, bm25)

    from radiant_rag_tpu.parallel.data import make_pseudo_query

    qidx = rng.choice(N_DOCS, N_QUERIES, replace=False)
    q_texts = [make_pseudo_query(docs[i], rng, max_words=8) for i in qidx]
    q_embs = embedder.embed(q_texts)
    targets = [rows[i] for i in qidx]

    def text_of(row):
        doc_id = store.id_for_row(int(row))
        doc = store.get_doc(doc_id) if doc_id else None
        return doc.content if doc is not None else None

    searcher.calibrate_fusion(embedder.embed, text_of)
    return store, bm25, searcher, q_embs, q_texts, targets


def _mrr(rows_out, targets):
    rr = 0.0
    for qi, target in enumerate(targets):
        hits = [int(r) for r in rows_out[qi] if r >= 0]
        if target in hits:
            rr += 1.0 / (hits.index(target) + 1)
    return rr / len(targets)


def test_calibrated_hybrid_not_below_best_leg(corpus_env):
    store, bm25, searcher, q_embs, q_texts, targets = corpus_env
    res = searcher.search_rows(q_embs, q_texts, dense_k=TOP_K, bm25_k=TOP_K,
                               fused_k=TOP_K)
    dense_mrr = _mrr(res["dense"][1], targets)
    bm25_mrr = _mrr(res["bm25"][1], targets)
    hybrid_mrr = _mrr(res["fused"][1], targets)
    assert searcher.last_calibration is not None
    assert hybrid_mrr >= max(dense_mrr, bm25_mrr) - EPS, (
        f"calibrated hybrid MRR {hybrid_mrr:.3f} fell below best leg "
        f"(dense {dense_mrr:.3f}, bm25 {bm25_mrr:.3f}) — fusion/calibration "
        "regression")


def test_quantized_two_stage_matches_exact(corpus_env):
    store, *_ = corpus_env
    rng = np.random.default_rng(11)
    q = rng.standard_normal((32, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    _, exact_rows = store.engine.search(q, TOP_K, mode="exact")
    # int8+rescore is the DEFAULT serving path (store._default_mode) and must
    # match exact within EPS. binary is the HBM-capacity tier whose stage-1
    # recall is corpus-hardness-dependent by design (D bits/doc) — its oracle
    # agreement is covered in test_store; gating it strictly here would pin a
    # corpus property, not a code invariant.
    _, approx_rows = store.engine.search(q, TOP_K, mode="int8")
    recall = np.mean([
        len(set(approx_rows[i][approx_rows[i] >= 0])
            & set(exact_rows[i][exact_rows[i] >= 0]))
        / max(1, (exact_rows[i] >= 0).sum())
        for i in range(q.shape[0])
    ])
    assert recall >= 1.0 - EPS, (
        f"int8 two-stage recall@{TOP_K} {recall:.3f} vs exact — "
        "quantization regression")


def test_cross_query_rrf_consensus_beats_single_first_place():
    """A doc ranked 2nd by BOTH decomposed queries must outrank a doc ranked
    1st by only one: 2/(60+2) > 1/(60+1)."""
    from radiant_rag_tpu.agents.fusion import RRFAgent
    from radiant_rag_tpu.index.doc import StoredDoc

    def d(i):
        return StoredDoc(f"doc{i}", f"content {i}", {})

    consensus, first_a, first_b = d(0), d(1), d(2)
    run_a = [(first_a, 0.9), (consensus, 0.8), (d(3), 0.7)]
    run_b = [(first_b, 0.9), (consensus, 0.8), (d(4), 0.7)]
    fused = RRFAgent().fuse([run_a, run_b], top_k=5)
    assert fused[0][0].doc_id == consensus.doc_id
    assert fused[0][1] == pytest.approx(2 / 62)
    # and each single first place scored 1/61 < 2/62
    by_id = {doc.doc_id: s for doc, s in fused}
    assert by_id["doc1"] == pytest.approx(1 / 61)
