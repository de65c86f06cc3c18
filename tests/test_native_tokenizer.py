"""Native (C++) tokenizer parity vs the Python reference implementations.

The native unit (`native/tokenizer.cpp`) handles ASCII texts; the wrapper
routes non-ASCII texts to Python — so parity on arbitrary mixed batches must
be exact (reference delegates tokenization to HF fast tokenizers inside
SentenceTransformer.encode, `rag_agents/models/local_models.py`)."""

import random
import string

import pytest

from radiant_rag_tpu.index.native import get_tok_lib
from radiant_rag_tpu.models.tokenizer import HashTokenizer, WordPieceTokenizer

pytestmark = pytest.mark.skipif(get_tok_lib() is None,
                                reason="no native toolchain")

CHARS = (string.ascii_letters + string.digits + string.punctuation +
         " \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f" + "  ")


def _random_texts(n, rng):
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(CHARS) for _ in range(rng.randrange(0, 200))))
    return out


def test_hash_tokenizer_native_parity():
    rng = random.Random(7)
    tok = HashTokenizer(vocab_size=30522)
    texts = _random_texts(64, rng) + ["", "   ", "hello, WORLD!!", "a" * 300]
    got = tok.tokenize_ids_batch(texts, cap=512)
    want = [tok.tokenize_ids(t)[:512] for t in texts]
    assert got == want


def test_hash_tokenizer_mixed_ascii_fallback():
    tok = HashTokenizer(vocab_size=2048)
    texts = ["plain ascii text", "café résumé 中文", "MiXeD CaSe 42!"]
    got = tok.tokenize_ids_batch(texts, cap=64)
    want = [tok.tokenize_ids(t)[:64] for t in texts]
    assert got == want


def test_hash_tokenizer_cap_truncates():
    tok = HashTokenizer(vocab_size=30522)
    text = " ".join(f"w{i}" for i in range(100))
    assert tok.tokenize_ids_batch([text], cap=10) == [tok.tokenize_ids(text)[:10]]


def _wp_vocab():
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "brown",
             "fox", "jump", "##ed", "##ing", "##s", "over", "lazy", "dog",
             "un", "##believ", "##able", ",", ".", "!", "7", "##7"]
    return {w: i for i, w in enumerate(words)}


def test_wordpiece_native_parity():
    tok = WordPieceTokenizer(_wp_vocab(), lowercase=True, max_chars_per_word=12)
    texts = [
        "The quick brown fox jumped over the lazy dog!",
        "unbelievable jumps, jumping 77.",
        "zzz unknownword the",           # unk paths
        "reallyreallylongword fox",      # > max_chars_per_word -> unk
        "",
        "... !!",
    ]
    got = tok.tokenize_ids_batch(texts, cap=128)
    want = [tok.tokenize_ids(t)[:128] for t in texts]
    assert got == want


def test_wordpiece_mixed_ascii_fallback():
    tok = WordPieceTokenizer(_wp_vocab())
    texts = ["the fox", "café fox", "中文"]
    got = tok.tokenize_ids_batch(texts, cap=32)
    want = [tok.tokenize_ids(t)[:32] for t in texts]
    assert got == want


def test_encode_batch_uses_native_path_same_output():
    tok = HashTokenizer(vocab_size=30522)
    texts = ["hello world", "the quick brown fox " * 30]
    ids_n, attn_n, types_n = tok.encode_batch(texts, max_len=64)
    # reference arrays built from the pure-python per-text path
    import numpy as np

    from radiant_rag_tpu.models.tokenizer import CLS_ID, SEP_ID, bucket_length

    want_rows = []
    for t in texts:
        a = tok.tokenize_ids(t)[:62]
        want_rows.append([CLS_ID] + a + [SEP_ID])
    blen = bucket_length(max(len(r) for r in want_rows), 64)
    assert ids_n.shape == (2, blen)
    for i, r in enumerate(want_rows):
        assert ids_n[i, : len(r)].tolist() == r
        assert attn_n[i, : len(r)].tolist() == [1] * len(r)
        assert int(attn_n[i].sum()) == len(r)
    assert types_n.sum() == 0
