"""Device-resident rerank (models/device_rerank.py) — VERDICT r4 #2.

The packed-pair layout assembled on device from the token table must score
IDENTICALLY to the host path (tokenizer.encode_batch(pairs=...) ->
CrossEncoder.score_pairs), so a CE trained on host-tokenized pairs transfers
to the gather path with no distribution shift."""

import jax.numpy as jnp
import numpy as np
import pytest

from radiant_rag_tpu.config import CrossEncoderConfig
from radiant_rag_tpu.models.bert import BertConfig
from radiant_rag_tpu.models.cross_encoder import CrossEncoder
from radiant_rag_tpu.models.device_rerank import DeviceReranker


@pytest.fixture(scope="module")
def ce():
    cfg = BertConfig(vocab_size=300, hidden_size=16, num_layers=1,
                     num_heads=2, intermediate_size=32, dtype=jnp.float32)
    return CrossEncoder(config=CrossEncoderConfig(max_seq_len=39, batch_size=8),
                        bert_cfg=cfg, params=None, seed=3)


TEXTS = [f"document number {i} about retrieval topic {i % 5} with extra "
         f"detail token{i}" for i in range(24)]


def test_scores_match_host_path(ce):
    rr = DeviceReranker(ce, q_len=8, d_len=28, pair_chunk=16)
    rr.build_table(TEXTS)
    queries = ["retrieval topic 3 detail", "document number 7"]
    rows = np.asarray([[3, 8, 13, 1], [7, 2, 9, -1]])
    scores, out_rows = rr.rerank_rows(queries, rows, top_k=4)

    # host path on the same (query, doc) pairs with the same truncation caps
    for qi, q in enumerate(queries):
        cand = [int(r) for r in rows[qi] if r >= 0]
        q_ids = ce.tokenizer.tokenize_ids_batch([q], cap=8)[0]
        host_scores = {}
        for r in cand:
            d_ids = ce.tokenizer.tokenize_ids_batch([TEXTS[r]], cap=28)[0]
            from radiant_rag_tpu.models.tokenizer import CLS_ID, SEP_ID

            ids = [CLS_ID] + q_ids + [SEP_ID] + d_ids + [SEP_ID]
            L = rr.L
            pad = L - len(ids)
            arr = np.asarray([ids + [0] * pad], np.int32)
            mask = np.asarray([[1] * len(ids) + [0] * pad], np.int32)
            types = np.asarray([[0] * (len(q_ids) + 2) + [1] * (len(d_ids) + 1)
                                + [0] * pad], np.int32)
            logit = ce._forward(ce.params, jnp.asarray(arr), jnp.asarray(mask),
                                jnp.asarray(types))
            host_scores[r] = float(np.asarray(logit)[0])
        dev = {int(r): float(s) for s, r in zip(scores[qi], out_rows[qi])
               if r >= 0}
        assert set(dev) == set(cand)
        for r in cand:
            np.testing.assert_allclose(dev[r], host_scores[r], rtol=2e-4,
                                       atol=2e-4)
        # CE-ordered descending
        vals = [dev[int(r)] for r in out_rows[qi] if r >= 0]
        assert vals == sorted(vals, reverse=True)


def test_invalid_rows_sort_last(ce):
    rr = DeviceReranker(ce, q_len=8, d_len=28, pair_chunk=8)
    rr.build_table(TEXTS)
    rows = np.asarray([[5, -1, 11, -1]])
    scores, out_rows = rr.rerank_rows(["topic"], rows, top_k=4)
    assert set(int(r) for r in out_rows[0][:2]) == {5, 11}
    assert all(r == -1 for r in out_rows[0][2:])
    assert np.isneginf(scores[0][2:]).all()


def test_append_extends_table(ce):
    rr = DeviceReranker(ce, q_len=8, d_len=28, pair_chunk=8)
    rr.build_table(TEXTS[:10])
    rr.append(TEXTS[10:12])
    assert rr.n_rows == 12
    scores, out_rows = rr.rerank_rows(["retrieval topic 0"],
                                      np.asarray([[10, 11, 0]]), top_k=3)
    assert set(int(r) for r in out_rows[0]) == {10, 11, 0}


def test_prior_blend_degenerates_correctly(ce):
    """weight 0 = pure CE order; huge weight = incoming prior order (the
    rerank stage cannot lose to the ordering it consumes)."""
    rr = DeviceReranker(ce, q_len=8, d_len=28, pair_chunk=8)
    rr.build_table(TEXTS)
    rows = np.asarray([[2, 9, 15, 4]])
    prior = np.asarray([[4.0, 3.0, 2.0, 1.0]], np.float32)  # prior: as given
    _s0, r0 = rr.rerank_rows(["retrieval topic"], rows, top_k=4)
    _s1, r1 = rr.rerank_rows(["retrieval topic"], rows, top_k=4,
                             prior_scores=prior, prior_weight=0.0)
    np.testing.assert_array_equal(r0, r1)  # weight 0 ignores the prior
    _s2, r2 = rr.rerank_rows(["retrieval topic"], rows, top_k=4,
                             prior_scores=prior, prior_weight=1e6)
    np.testing.assert_array_equal(r2, rows)  # huge weight = prior order
