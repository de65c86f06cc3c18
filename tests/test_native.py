"""Native C++ BM25 builder: availability + byte-exact parity with the Python
tokenizer/indexer path."""

import numpy as np
import pytest

from radiant_rag_tpu.index.bm25 import BM25Index, tokenize
from radiant_rag_tpu.index.native import bulk_build, get_lib

TEXTS = [
    "The quick brown fox JUMPS over the lazy dog!",
    "a lazy dog sleeps; another lazy dog naps...",
    "Zürich straße — ünïcode test with ascii words inside",
    "numbers 42 and 1234abc mixed x1 y z2",
    "",
    "repeat repeat repeat repeat",
]


def test_native_lib_compiles():
    lib = get_lib()
    assert lib is not None, "g++ toolchain present; native builder must compile"


def test_native_matches_python_tokenizer():
    built = bulk_build(TEXTS, list(range(len(TEXTS))))
    assert built is not None
    for i, text in enumerate(TEXTS):
        py_tokens = tokenize(text)
        assert built.doc_lens[i] == len(py_tokens), text
        # counts match
        from collections import Counter

        py_counts = Counter(py_tokens)
        s, e = built.doc_term_start[i], built.doc_term_start[i + 1]
        native_counts = {built.terms[tid]: tf
                         for tid, tf in zip(built.doc_term_ids[s:e], built.doc_term_tfs[s:e])}
        assert native_counts == dict(py_counts), text


def test_native_index_matches_python_index():
    rows = list(range(10, 10 + len(TEXTS)))
    py_idx = BM25Index()
    for row, t in zip(rows, TEXTS):
        py_idx.add_document(row, t)
    nat_idx = BM25Index()
    assert nat_idx.bulk_build(rows, TEXTS)

    assert nat_idx.num_docs == py_idx.num_docs
    assert abs(nat_idx.avgdl - py_idx.avgdl) < 1e-9
    assert set(nat_idx.vocab) == set(py_idx.vocab)
    for term in py_idx.vocab:
        assert nat_idx.df[nat_idx.vocab[term]] == py_idx.df[py_idx.vocab[term]], term

    for query in ("lazy dog", "quick fox numbers", "repeat"):
        s1, r1 = py_idx.search_rows(query, top_k=6)
        s2, r2 = nat_idx.search_rows(query, top_k=6)
        np.testing.assert_allclose(np.sort(s1), np.sort(s2), rtol=1e-5)
        assert set(r1.tolist()) == set(r2.tolist())


def test_native_then_incremental_add():
    rows = list(range(len(TEXTS)))
    idx = BM25Index()
    idx.bulk_build(rows, TEXTS)
    idx.add_document(100, "an entirely new document about foxes and dogs")
    s, r = idx.search_rows("foxes", top_k=3)
    assert 100 in set(int(x) for x in r if x >= 0)
    # old content still searchable
    s, r = idx.search_rows("lazy dog", top_k=5)
    assert len([x for x in r if x >= 0]) >= 2
    # removal of a bulk row
    assert idx.remove_document(rows[1])
    s, r = idx.search_rows("sleeps", top_k=3)
    assert rows[1] not in set(int(x) for x in r if x >= 0)


def test_bulk_build_python_fallback(monkeypatch):
    import radiant_rag_tpu.index.bm25 as bm25_mod

    idx = BM25Index()
    monkeypatch.setattr("radiant_rag_tpu.index.native.bulk_build",
                        lambda texts, rows: None)
    assert not idx.bulk_build([0, 1], ["alpha beta", "beta gamma"])
    assert idx.num_docs == 2
    s, r = idx.search_rows("beta", top_k=2)
    assert len([x for x in r if x >= 0]) == 2


def test_native_build_vocab_past_reserve():
    """Regression: >65536 unique terms must not dangle vocab string_views.

    The vocab map keys are string_views into the term store; a vector-backed
    store reallocated past its reserve(1<<16) and moved SSO strings, which
    segfaulted the whole process (ADVICE.md r1, high). The store is now a
    deque with stable element addresses.
    """
    from radiant_rag_tpu.index import native

    n_docs, per_doc = 1500, 100  # 150k unique terms, > 2x the reserve
    texts = [" ".join(f"t{d}q{i}" for i in range(per_doc)) + " shared"
             for d in range(n_docs)]
    b = native.bulk_build(texts, list(range(n_docs)))
    if b is None:
        import pytest
        pytest.skip("native builder unavailable")
    assert len(b.terms) == n_docs * per_doc + 1
    assert int(b.df[b.terms.index("shared")]) == n_docs
    assert (b.doc_lens == per_doc + 1).all()
    # postings CSR is consistent
    assert int(b.term_start[-1]) == len(b.post_rows)
