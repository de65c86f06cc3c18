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

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "bm25_build.cpp"
_CACHE_DIR = Path(os.path.expanduser(os.environ.get(
    "RADIANT_NATIVE_CACHE", "~/.cache/radiant_tpu/native")))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _compile() -> Optional[Path]:
    if not _SRC.is_file():
        return None
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    so = _CACHE_DIR / f"bm25_build_{int(_SRC.stat().st_mtime)}.so"
    if so.is_file():
        return so
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(_SRC), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("compiled native bm25 builder -> %s", so)
        return so
    except Exception as exc:
        logger.info("native bm25 builder unavailable (%s); using python path", exc)
        return None


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
        _lib = lib
        return _lib


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
