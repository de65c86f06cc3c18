"""ctypes bridge to the native (C++) bulk BM25 builder.

The shared library is compiled on first use with g++ -O3 (cached by source
mtime); everything degrades gracefully to the Python path when no compiler is
available. pybind11 is intentionally not used (not in the toolchain) — the C
ABI + ctypes keeps the boundary minimal.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "bm25_build.cpp"
_TOK_SRC = _NATIVE_DIR / "tokenizer.cpp"
_CACHE_DIR = Path(os.path.expanduser(os.environ.get(
    "RADIANT_NATIVE_CACHE", "~/.cache/radiant_tpu/native")))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False
_tok_lib: Optional[ctypes.CDLL] = None
_tok_failed = False


def _compile_unit(src: Path, stem: str) -> Optional[Path]:
    """g++-compile one shared object, cached by source mtime."""
    if not src.is_file():
        return None
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    so = _CACHE_DIR / f"{stem}_{int(src.stat().st_mtime)}.so"
    if so.is_file():
        return so
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(src), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("compiled native %s -> %s", stem, so)
        return so
    except Exception as exc:
        logger.info("native %s unavailable (%s); using python path", stem, exc)
        return None


def _compile() -> Optional[Path]:
    return _compile_unit(_SRC, "bm25_build")


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _compile()
        if so is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError as exc:
            logger.info("failed to load native lib: %s", exc)
            _lib_failed = True
            return None
        lib.bm25_build.restype = ctypes.c_void_p
        lib.bm25_build.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_void_p]
        lib.bm25_build_free.argtypes = [ctypes.c_void_p]
        for name in ("bm25_num_terms", "bm25_num_postings",
                     "bm25_term_bytes_len", "bm25_doc_terms_len"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name, restype in (
            ("bm25_term_bytes", ctypes.c_void_p),
            ("bm25_term_offsets", ctypes.POINTER(ctypes.c_int64)),
            ("bm25_df", ctypes.POINTER(ctypes.c_int64)),
            ("bm25_term_start", ctypes.POINTER(ctypes.c_int64)),
            ("bm25_post_rows", ctypes.POINTER(ctypes.c_int32)),
            ("bm25_post_tfs", ctypes.POINTER(ctypes.c_float)),
            ("bm25_doc_lens", ctypes.POINTER(ctypes.c_int32)),
            ("bm25_doc_term_start", ctypes.POINTER(ctypes.c_int64)),
            ("bm25_doc_term_ids", ctypes.POINTER(ctypes.c_int32)),
            ("bm25_doc_term_tfs", ctypes.POINTER(ctypes.c_int32)),
        ):
            getattr(lib, name).restype = restype
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.bm25_query_ctx_new.restype = ctypes.c_void_p
        lib.bm25_query_ctx_new.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_int64]
        lib.bm25_query_ctx_free.argtypes = [ctypes.c_void_p]
        lib.bm25_query_tids.restype = ctypes.c_int64
        lib.bm25_query_tids.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib


class QueryTokenizer:
    """Native query tokenize-to-term-ids over a frozen vocab snapshot.

    Owns a C-side hash of the vocabulary; `tids_batch` turns a query batch
    into a (B, max_terms) int32 array of unique in-vocab term ids (-1 pad)
    with byte-identical tokenizer semantics to `index/bm25.tokenize` —
    without materializing any Python token strings (~20x faster at B=1024)."""

    def __init__(self, lib: ctypes.CDLL, terms: Sequence[str]) -> None:
        self._lib = lib
        # contiguous term bytes + offsets (no separators in the C layout)
        encoded = [t.encode("utf-8", errors="replace") for t in terms]
        offsets = np.zeros(len(encoded) + 1, np.int64)
        if encoded:
            np.cumsum([len(b) for b in encoded], out=offsets[1:])
        blob = b"".join(encoded)
        self.n_terms = len(encoded)
        self._handle = lib.bm25_query_ctx_new(
            ctypes.cast(ctypes.c_char_p(blob), ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p),
            self.n_terms)

    def tids_batch(self, texts: Sequence[str], cap_tokens: int,
                   max_terms: int) -> np.ndarray:
        blob, offsets = _pack_blobs(texts)
        out = np.full((len(texts), max_terms), -1, np.int32)
        self._lib.bm25_query_tids(
            self._handle,
            ctypes.cast(ctypes.c_char_p(blob), ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p),
            len(texts), cap_tokens, max_terms,
            out.ctypes.data_as(ctypes.c_void_p))
        return out

    def __del__(self) -> None:
        try:
            if getattr(self, "_handle", None):
                self._lib.bm25_query_ctx_free(self._handle)
        except Exception:
            pass


def make_query_tokenizer(terms: Sequence[str]) -> Optional["QueryTokenizer"]:
    lib = get_lib()
    if lib is None:
        return None
    try:
        return QueryTokenizer(lib, terms)
    except Exception as exc:  # pragma: no cover - defensive
        logger.info("native query tokenizer unavailable: %s", exc)
        return None


class NativeBM25Build:
    """Result of a native bulk build (numpy views copied out)."""

    def __init__(self, terms: List[str], df: np.ndarray, term_start: np.ndarray,
                 post_rows: np.ndarray, post_tfs: np.ndarray,
                 doc_lens: np.ndarray, doc_term_start: np.ndarray,
                 doc_term_ids: np.ndarray, doc_term_tfs: np.ndarray) -> None:
        self.terms = terms
        self.df = df
        self.term_start = term_start
        self.post_rows = post_rows
        self.post_tfs = post_tfs
        self.doc_lens = doc_lens
        self.doc_term_start = doc_term_start
        self.doc_term_ids = doc_term_ids
        self.doc_term_tfs = doc_term_tfs


def bulk_build(texts: Sequence[str], rows: Sequence[int]) -> Optional[NativeBM25Build]:
    """Run the native builder; None if the native path is unavailable."""
    lib = get_lib()
    if lib is None or not texts:
        return None
    blobs = [t.encode("utf-8", errors="replace") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    buf = b"".join(blobs)
    rows_arr = np.asarray(rows, np.int32)
    handle = lib.bm25_build(
        ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        len(blobs),
        rows_arr.ctypes.data_as(ctypes.c_void_p),
    )
    if not handle:
        return None
    try:
        t = lib.bm25_num_terms(handle)
        p = lib.bm25_num_postings(handle)
        nb = lib.bm25_term_bytes_len(handle)
        dt = lib.bm25_doc_terms_len(handle)
        n = len(blobs)

        def arr(fn, count, dtype):
            ptr = fn(handle)
            if count == 0:
                return np.zeros(0, dtype)
            return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype, copy=True)

        term_bytes = ctypes.string_at(lib.bm25_term_bytes(handle), nb)
        term_offsets = arr(lib.bm25_term_offsets, t + 1, np.int64)
        terms = [term_bytes[term_offsets[i]: term_offsets[i + 1]].decode("utf-8")
                 for i in range(t)]
        return NativeBM25Build(
            terms=terms,
            df=arr(lib.bm25_df, t, np.int64),
            term_start=arr(lib.bm25_term_start, t + 1, np.int64),
            post_rows=arr(lib.bm25_post_rows, p, np.int32),
            post_tfs=arr(lib.bm25_post_tfs, p, np.float32),
            doc_lens=arr(lib.bm25_doc_lens, n, np.int32),
            doc_term_start=arr(lib.bm25_doc_term_start, n + 1, np.int64),
            doc_term_ids=arr(lib.bm25_doc_term_ids, dt, np.int32),
            doc_term_tfs=arr(lib.bm25_doc_term_tfs, dt, np.int32),
        )
    finally:
        lib.bm25_build_free(handle)


# --------------------------------------------------------------------------- #
# Native tokenizer bridge (native/tokenizer.cpp)
# --------------------------------------------------------------------------- #

def get_tok_lib() -> Optional[ctypes.CDLL]:
    """Load (compiling on first use) the native tokenizer; None if unavailable."""
    global _tok_lib, _tok_failed
    with _lock:
        if _tok_lib is not None or _tok_failed:
            return _tok_lib
        if os.environ.get("RADIANT_NO_NATIVE_TOKENIZER"):
            _tok_failed = True
            return None
        so = _compile_unit(_TOK_SRC, "tokenizer")
        if so is None:
            _tok_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError as exc:
            logger.info("failed to load native tokenizer: %s", exc)
            _tok_failed = True
            return None
        lib.tok_hash_batch.restype = None
        lib.tok_hash_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.wp_new.restype = ctypes.c_void_p
        lib.wp_new.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.wp_free.restype = None
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_tokenize_batch.restype = None
        lib.wp_tokenize_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
        _tok_lib = lib
        return _tok_lib


def _pack_blobs(texts: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    blobs = [t.encode("utf-8", errors="replace") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    return b"".join(blobs), offsets


def hash_tokenize_batch(texts: Sequence[str], vocab_size: int, reserved: int,
                        max_ids: int) -> Optional[List[List[int]]]:
    """Native FNV-1a hash tokenization; None if the native path is unavailable.

    Callers must pre-filter to ASCII texts (Python-fallback otherwise)."""
    lib = get_tok_lib()
    if lib is None or not texts:
        return None
    buf, offsets = _pack_blobs(texts)
    n = len(texts)
    out_ids = np.empty((n, max_ids), np.int32)
    out_lens = np.empty((n,), np.int32)
    lib.tok_hash_batch(
        ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p), n,
        vocab_size, reserved, max_ids,
        out_ids.ctypes.data_as(ctypes.c_void_p),
        out_lens.ctypes.data_as(ctypes.c_void_p))
    return [out_ids[i, : out_lens[i]].tolist() for i in range(n)]


class NativeWordPiece:
    """Owned handle over the native WordPiece vocab (built once, reused)."""

    def __init__(self, vocab, unk_id: int, lowercase: bool,
                 max_chars_per_word: int) -> None:
        lib = get_tok_lib()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = lib
        terms = list(vocab.keys())
        ids = np.asarray([vocab[t] for t in terms], np.int32)
        buf, offsets = _pack_blobs(terms)
        self._handle = lib.wp_new(
            ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p), len(terms),
            ids.ctypes.data_as(ctypes.c_void_p),
            unk_id, 1 if lowercase else 0, max_chars_per_word)

    def tokenize_batch(self, texts: Sequence[str], max_ids: int) -> List[List[int]]:
        if not texts:
            return []
        buf, offsets = _pack_blobs(texts)
        n = len(texts)
        out_ids = np.empty((n, max_ids), np.int32)
        out_lens = np.empty((n,), np.int32)
        self._lib.wp_tokenize_batch(
            self._handle,
            ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p), n, max_ids,
            out_ids.ctypes.data_as(ctypes.c_void_p),
            out_lens.ctypes.data_as(ctypes.c_void_p))
        return [out_ids[i, : out_lens[i]].tolist() for i in range(n)]

    def __del__(self) -> None:
        handle = getattr(self, "_handle", None)
        if handle:
            try:
                self._lib.wp_free(handle)
            except Exception:
                pass
            self._handle = None
