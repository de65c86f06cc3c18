"""Host-side tokenization for the flax encoders.

Two implementations behind one interface:

  WordPieceTokenizer  greedy longest-match-first WordPiece over a vocab file
                      (BERT semantics; loads `vocab.txt` from a local model
                      dir — no network, this environment is zero-egress).
  HashTokenizer       deterministic fallback when no vocab exists: alnum
                      word split + FNV-hash into the id space. Keeps the whole
                      framework runnable (and benchmarkable) with the
                      deterministically-initialized encoder.

Tokenization stays on the host; sequence lengths are bucketed to powers of two
so device programs see a small set of static shapes (SURVEY.md §7.4.4:
variable-length text on fixed-shape hardware).
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from radiant_rag_tpu.utils.hashing import stable_hash32

PAD_ID = 0
UNK_ID = 100
CLS_ID = 101
SEP_ID = 102

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]", re.I)

LENGTH_BUCKETS = (16, 32, 64, 128, 256, 384, 512)


def bucket_length(n: int, max_len: int) -> int:
    for b in LENGTH_BUCKETS:
        if b >= n and b <= max_len:
            return b
    return max_len


class _BaseTokenizer:
    vocab_size: int = 30522

    def tokenize_ids(self, text: str) -> List[int]:  # without special tokens
        raise NotImplementedError

    def tokenize_ids_batch(self, texts: Sequence[str], cap: int) -> List[List[int]]:
        """Batched tokenize, each result truncated to `cap` ids. Subclasses
        override with the native (C++) fast path; the cap is safe for
        encode_batch because every downstream truncation is < max_len."""
        return [self.tokenize_ids(t)[:cap] for t in texts]

    def encode_batch(
        self,
        texts: Sequence[str],
        max_len: int = 256,
        pairs: Optional[Sequence[str]] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (input_ids, attention_mask, token_type_ids), padded to one
        shared bucketed length. Pair encoding: [CLS] a [SEP] b [SEP]."""
        encoded: List[Tuple[List[int], List[int]]] = []
        a_ids = self.tokenize_ids_batch(texts, cap=max_len)
        b_ids = self.tokenize_ids_batch(pairs, cap=max_len) if pairs is not None else None
        for i, t in enumerate(texts):
            a = a_ids[i]
            if pairs is not None:
                b = b_ids[i]
                # truncate proportionally, reserve 3 special tokens
                budget = max_len - 3
                if len(a) + len(b) > budget:
                    half = budget // 2
                    if len(a) <= half:
                        b = b[: budget - len(a)]
                    elif len(b) <= half:
                        a = a[: budget - len(b)]
                    else:
                        a, b = a[:half], b[: budget - half]
                ids = [CLS_ID] + a + [SEP_ID] + b + [SEP_ID]
                types = [0] * (len(a) + 2) + [1] * (len(b) + 1)
            else:
                a = a[: max_len - 2]
                ids = [CLS_ID] + a + [SEP_ID]
                types = [0] * len(ids)
            encoded.append((ids, types))

        longest = max((len(ids) for ids, _ in encoded), default=1)
        blen = bucket_length(longest, max_len)
        n = len(texts)
        input_ids = np.full((n, blen), PAD_ID, np.int32)
        attn = np.zeros((n, blen), np.int32)
        type_ids = np.zeros((n, blen), np.int32)
        for i, (ids, types) in enumerate(encoded):
            ids = ids[:blen]
            types = types[:blen]
            input_ids[i, : len(ids)] = ids
            attn[i, : len(ids)] = 1
            type_ids[i, : len(types)] = types
        return input_ids, attn, type_ids


class HashTokenizer(_BaseTokenizer):
    """Deterministic hash tokenizer (no vocab file needed)."""

    def __init__(self, vocab_size: int = 30522) -> None:
        if vocab_size < 128:
            raise ValueError("HashTokenizer needs vocab_size >= 128 (special ids < 103)")
        self.vocab_size = vocab_size
        # ids below this are special/unused; scale down for tiny test vocabs
        self._reserved = min(999, max(103, vocab_size // 4))

    def tokenize_ids(self, text: str) -> List[int]:
        words = _WORD_RE.findall(text.lower())
        span = self.vocab_size - self._reserved
        return [self._reserved + (stable_hash32(w) % span) for w in words]

    def tokenize_ids_batch(self, texts: Sequence[str], cap: int) -> List[List[int]]:
        """Native C++ fast path for ASCII texts (byte-identical to
        tokenize_ids there); per-text Python fallback for the rest."""
        from radiant_rag_tpu.index import native

        ascii_idx = [i for i, t in enumerate(texts) if t.isascii()]
        if not ascii_idx or native.get_tok_lib() is None:
            return super().tokenize_ids_batch(texts, cap)
        res = native.hash_tokenize_batch(
            [texts[i] for i in ascii_idx], self.vocab_size, self._reserved, cap)
        if res is None:
            return super().tokenize_ids_batch(texts, cap)
        out: List[Optional[List[int]]] = [None] * len(texts)
        for j, i in enumerate(ascii_idx):
            out[i] = res[j]
        for i, t in enumerate(texts):
            if out[i] is None:
                out[i] = self.tokenize_ids(t)[:cap]
        return out  # type: ignore[return-value]


class WordPieceTokenizer(_BaseTokenizer):
    """Greedy longest-match-first WordPiece (BERT uncased semantics)."""

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True, max_chars_per_word: int = 100) -> None:
        self.vocab = vocab
        self.vocab_size = max(vocab.values()) + 1
        self.lowercase = lowercase
        self.max_chars_per_word = max_chars_per_word
        self.unk_id = vocab.get("[UNK]", UNK_ID)
        self._native = None  # lazily-built native handle (or False if unavailable)

    def tokenize_ids_batch(self, texts: Sequence[str], cap: int) -> List[List[int]]:
        """Native greedy WordPiece for ASCII texts; Python fallback otherwise."""
        if self._native is None:
            from radiant_rag_tpu.index import native

            try:
                if native.get_tok_lib() is not None:
                    self._native = native.NativeWordPiece(
                        self.vocab, self.unk_id, self.lowercase,
                        self.max_chars_per_word)
                else:
                    self._native = False
            except Exception:
                self._native = False
        if self._native is False:
            return super().tokenize_ids_batch(texts, cap)
        ascii_idx = [i for i, t in enumerate(texts) if t.isascii()]
        out: List[Optional[List[int]]] = [None] * len(texts)
        if ascii_idx:
            res = self._native.tokenize_batch([texts[i] for i in ascii_idx], cap)
            for j, i in enumerate(ascii_idx):
                out[i] = res[j]
        for i, t in enumerate(texts):
            if out[i] is None:
                out[i] = self.tokenize_ids(t)[:cap]
        return out  # type: ignore[return-value]

    @classmethod
    def from_vocab_file(cls, path: str) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                vocab[line.rstrip("\n")] = i
        return cls(vocab)

    def tokenize_ids(self, text: str) -> List[int]:
        if self.lowercase:
            text = text.lower()
        out: List[int] = []
        for word in _WORD_RE.findall(text):
            if len(word) > self.max_chars_per_word:
                out.append(self.unk_id)
                continue
            start = 0
            word_ids: List[int] = []
            ok = True
            while start < len(word):
                end = len(word)
                cur = None
                while start < end:
                    piece = word[start:end]
                    if start > 0:
                        piece = "##" + piece
                    pid = self.vocab.get(piece)
                    if pid is not None:
                        cur = pid
                        break
                    end -= 1
                if cur is None:
                    ok = False
                    break
                word_ids.append(cur)
                start = end
            out.extend(word_ids if ok else [self.unk_id])
        return out


def load_tokenizer(model_dir: str = "", vocab_size: int = 30522) -> _BaseTokenizer:
    """Load a WordPiece vocab from a local model dir, else hash fallback."""
    if model_dir:
        vocab_path = Path(model_dir) / "vocab.txt"
        if vocab_path.is_file():
            return WordPieceTokenizer.from_vocab_file(str(vocab_path))
    return HashTokenizer(vocab_size)
