"""BM25 sparse index: host CSR postings + device term-at-a-time scoring.

Capability parity with the reference's `BM25Index`/`PersistentBM25Index`
(`storage/bm25_index.py`): same tokenizer (lowercase alnum-only, len>1,
`bm25_index.py:50-58`), same BM25 variant (k1=1.5, b=0.75, idf =
ln((n-df+0.5)/(df+0.5)+1), `bm25_index.py:134`), incremental adds, gzip-JSON
persistence with atomic replace (`bm25_index.py:420-470`), and
build/sync-from-store (`bm25_index.py:574-652`).

The hot loop is redesigned: instead of iterating all docs per query term
(O(terms x docs x doclen), `bm25_index.py:235-262`), the index keeps an
inverted posting list per term (row, tf); a query gathers its terms' postings
on host (numpy, O(matched postings)) and scores them on device with one
scatter-add + top-k program (`ops/bm25.py`). Scoring shares the vector
engine's row space so hybrid RRF fusion stays on device.
"""

from __future__ import annotations

import gzip
import json
import logging
import math
import os
import re
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.ops.bm25 import PAGE_SIZE, bm25_pages_score_topk

logger = logging.getLogger(__name__)

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> List[str]:
    """Reference tokenizer: lowercase, alnum runs only, length > 1
    (`bm25_index.py:50-58`)."""
    return [t for t in _TOKEN_RE.findall(text.lower()) if len(t) > 1]


def _next_pow2(n: int, floor: int = 64) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class _Postings:
    """Growable posting list for one term with a cached numpy view."""

    __slots__ = ("rows", "tfs", "_cache")

    def __init__(self) -> None:
        self.rows: List[int] = []
        self.tfs: List[int] = []
        self._cache: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def add(self, row: int, tf: int) -> None:
        self.rows.append(row)
        self.tfs.append(tf)
        self._cache = None

    def arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is None:
            self._cache = (
                np.asarray(self.rows, np.int32),
                np.asarray(self.tfs, np.float32),
            )
        return self._cache

    def __len__(self) -> int:
        return len(self.rows)


class BM25Index:
    """In-memory inverted index over device rows."""

    def __init__(self, k1: float = 1.5, b: float = 0.75,
                 max_query_terms: int = 32, max_postings: int = 1 << 18,
                 sketch_dim: int = 1024) -> None:
        self.k1 = k1
        self.b = b
        self.max_query_terms = max_query_terms
        self.max_postings = max_postings
        self.sketch_dim = sketch_dim
        self.vocab: Dict[str, int] = {}
        self.postings: List[_Postings] = []
        self.df: List[int] = []
        self.doc_tokens: Dict[int, List[str]] = {}  # row -> tokens (persistence)
        self.doc_lens: Dict[int, int] = {}
        self.total_len = 0
        self.removed: set = set()
        self._dl_dev: Optional[jnp.ndarray] = None
        self._dl_size = 0
        self._dl_dirty = True
        # device-resident CSR postings (built lazily, invalidated on mutation)
        self._csr_dirty = True
        self._dev_post_rows: Optional[jnp.ndarray] = None
        self._dev_post_tf: Optional[jnp.ndarray] = None
        self._term_start: Optional[np.ndarray] = None  # host (T+1,)
        self._term_idf: Optional[np.ndarray] = None  # host (T,)
        # impact sketch (stage-1 BM25-as-matmul)
        self._sketch: Optional[jnp.ndarray] = None  # (num_docs, S) int8
        self._sketch_scale: Optional[jnp.ndarray] = None
        self._sketch_rows = 0
        self._sketch_dirty = True
        self._term_bin: Dict[int, int] = {}  # tid -> hash bin (cached)

    # -- build -------------------------------------------------------------
    @property
    def num_docs(self) -> int:
        return len(self.doc_lens)

    @property
    def avgdl(self) -> float:
        return self.total_len / self.num_docs if self.num_docs else 0.0

    def add_document(self, row: int, text_or_tokens) -> None:
        tokens = text_or_tokens if isinstance(text_or_tokens, list) else tokenize(text_or_tokens)
        if row in self.doc_lens:
            self.remove_document(row)
        counts: Dict[str, int] = {}
        for t in tokens:
            counts[t] = counts.get(t, 0) + 1
        for term, tf in counts.items():
            tid = self.vocab.get(term)
            if tid is None:
                tid = len(self.vocab)
                self.vocab[term] = tid
                self.postings.append(_Postings())
                self.df.append(0)
            self.postings[tid].add(row, tf)
            self.df[tid] += 1
        self.doc_tokens[row] = tokens
        self.doc_lens[row] = len(tokens)
        self.total_len += len(tokens)
        self.removed.discard(row)
        self._dl_dirty = True
        self._csr_dirty = True
        self._sketch_dirty = True

    def remove_document(self, row: int) -> bool:
        """Lazy removal: mark row dead; postings are purged on rebuild
        (reference forces a full rebuild on removal, `bm25_index.py:182-216`;
        here dead rows are masked at scoring time and the index is compacted
        once >25% of rows are dead)."""
        if row not in self.doc_lens:
            return False
        self.total_len -= self.doc_lens.pop(row)
        self.doc_tokens.pop(row, None)
        self.removed.add(row)
        self._dl_dirty = True
        self._csr_dirty = True
        self._sketch_dirty = True
        if self.num_docs and len(self.removed) > 0.25 * (self.num_docs + len(self.removed)):
            self.rebuild()
        return True

    def rebuild(self) -> None:
        docs = dict(self.doc_tokens)
        self.vocab.clear()
        self.postings = []
        self.df = []
        self.doc_tokens = {}
        self.doc_lens = {}
        self.total_len = 0
        self.removed = set()
        for row, tokens in docs.items():
            self.add_document(row, tokens)

    # -- search ------------------------------------------------------------
    def _idf(self, tid: int) -> float:
        n = self.num_docs
        df = self.df[tid]
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def _device_doc_lens(self, num_rows: int) -> jnp.ndarray:
        if self._dl_dirty or self._dl_size < num_rows:
            size = _next_pow2(max(num_rows, 1), floor=256)
            dl = np.zeros((size,), np.float32)
            for row, ln in self.doc_lens.items():
                if row < size:
                    dl[row] = ln
            self._dl_dev = jnp.asarray(dl)
            self._dl_size = size
            self._dl_dirty = False
        return self._dl_dev

    def _finalize_csr(self) -> None:
        """Build/refresh the device-resident CSR posting arrays.

        Postings of removed rows are dropped here; between finalizations the
        valid mask hides them at scoring time."""
        if not self._csr_dirty and self._dev_post_rows is not None:
            return
        t = len(self.vocab)
        starts = np.zeros((t + 1,), np.int64)
        arrays = []
        for tid in range(t):
            pr, pt = self.postings[tid].arrays()
            if self.removed:
                keep = ~np.isin(pr, np.fromiter(self.removed, np.int64))
                pr, pt = pr[keep], pt[keep]
            arrays.append((pr, pt))
            starts[tid + 1] = starts[tid] + len(pr)
        total = int(starts[-1])
        size = _next_pow2(max(total, 1), floor=PAGE_SIZE)
        rows = np.zeros((size,), np.int32)
        tfs = np.zeros((size,), np.float32)
        for tid, (pr, pt) in enumerate(arrays):
            rows[starts[tid] : starts[tid + 1]] = pr
            tfs[starts[tid] : starts[tid + 1]] = pt
        self._term_start = starts
        self._term_idf = np.asarray([self._idf(tid) for tid in range(t)], np.float32)
        self._host_post_rows = rows  # kept for sketch/impact builds
        self._host_post_tf = tfs
        self._dev_post_rows = jnp.asarray(rows)
        self._dev_post_tf = jnp.asarray(tfs)
        self._csr_dirty = False

    def _bin_of(self, tid: int, term: str) -> int:
        b = self._term_bin.get(tid)
        if b is None:
            from radiant_rag_tpu.utils.hashing import stable_hash32

            b = stable_hash32(term) % self.sketch_dim
            self._term_bin[tid] = b
        return b

    def ensure_sketch(self, num_docs: int) -> None:
        """Build/refresh the (num_docs, S) int8 impact sketch on device.

        Each posting's exact BM25 contribution is precomputed on host (it only
        depends on tf, dl, df, avgdl — all known at finalize) and scattered
        into hashed term bins in one device program (`ops/bm25.py:
        build_impact_sketch`). Stage-1 BM25 then becomes an int8 MXU matmul.
        """
        if self.sketch_dim <= 0:
            return
        if not self._sketch_dirty and self._sketch_rows >= num_docs:
            return
        from radiant_rag_tpu.ops.bm25 import build_impact_sketch

        self._finalize_csr()
        rows_parts: List[np.ndarray] = []
        w_parts: List[np.ndarray] = []
        bin_parts: List[np.ndarray] = []
        avgdl = max(self.avgdl, 1e-6)
        dl_arr = np.zeros((num_docs,), np.float32)
        for row, ln in self.doc_lens.items():
            if row < num_docs:
                dl_arr[row] = ln
        inv_vocab = {tid: term for term, tid in self.vocab.items()}
        for tid in range(len(self.vocab)):
            s, e = int(self._term_start[tid]), int(self._term_start[tid + 1])
            if e == s:
                continue
            pr = np.asarray(self._host_post_rows[s:e])
            pt = np.asarray(self._host_post_tf[s:e])
            dl = dl_arr[np.minimum(pr, num_docs - 1)]
            denom = pt + self.k1 * (1.0 - self.b + self.b * dl / avgdl)
            w = self._term_idf[tid] * pt * (self.k1 + 1.0) / np.maximum(denom, 1e-6)
            rows_parts.append(pr)
            w_parts.append(w.astype(np.float32))
            bin_parts.append(np.full(e - s, self._bin_of(tid, inv_vocab[tid]), np.int32))
        if rows_parts:
            rows = np.concatenate(rows_parts)
            ws = np.concatenate(w_parts)
            bins = np.concatenate(bin_parts)
        else:
            rows = np.zeros((1,), np.int32)
            ws = np.zeros((1,), np.float32)
            bins = np.zeros((1,), np.int32)
        pad = _next_pow2(len(rows), floor=256)
        rows = np.pad(rows, (0, pad - len(rows)))
        ws = np.pad(ws, (0, pad - len(ws)))
        bins = np.pad(bins, (0, pad - len(bins)))
        self._sketch, self._sketch_scale = build_impact_sketch(
            jnp.asarray(rows.astype(np.int32)), jnp.asarray(ws), jnp.asarray(bins),
            num_docs, self.sketch_dim,
        )
        self._sketch_rows = num_docs
        self._sketch_dirty = False

    def make_query_indicator(self, queries: Sequence[str]) -> np.ndarray:
        """(B, S) int8 indicator over each query's unique terms' bins."""
        out = np.zeros((len(queries), self.sketch_dim), np.int8)
        for qi, q in enumerate(queries):
            terms = tokenize(q)[: self.max_query_terms]
            for term in dict.fromkeys(terms):
                tid = self.vocab.get(term)
                if tid is not None:
                    out[qi, self._bin_of(tid, term)] += 1
        return out

    def make_pages(self, queries: Sequence[str]) -> Dict[str, np.ndarray]:
        """Build the per-batch page table (host; KBs).

        Each page covers PAGE_SIZE consecutive postings of one (query, term).
        The per-query posting budget favors rare (high-idf) terms first."""
        starts_l: List[int] = []
        lens_l: List[int] = []
        qidx_l: List[int] = []
        idf_l: List[float] = []
        for qi, q in enumerate(queries):
            terms = tokenize(q)[: self.max_query_terms]
            tids = [self.vocab[t] for t in dict.fromkeys(terms) if t in self.vocab]
            tids.sort(key=lambda tid: self._term_start[tid + 1] - self._term_start[tid])
            budget = self.max_postings
            for tid in tids:
                if budget <= 0:
                    break
                s = int(self._term_start[tid])
                ln = int(self._term_start[tid + 1]) - s
                ln = min(ln, budget)
                budget -= ln
                idf = float(self._term_idf[tid])
                for off in range(0, ln, PAGE_SIZE):
                    starts_l.append(s + off)
                    lens_l.append(min(PAGE_SIZE, ln - off))
                    qidx_l.append(qi)
                    idf_l.append(idf)
        n_pages = max(len(starts_l), 1)
        bucket = _next_pow2(n_pages, floor=16)
        start = np.zeros((bucket,), np.int32)
        plen = np.zeros((bucket,), np.int32)  # zero-length pages are inert
        qidx = np.zeros((bucket,), np.int32)
        idf = np.zeros((bucket,), np.float32)
        if starts_l:
            start[: len(starts_l)] = starts_l
            plen[: len(lens_l)] = lens_l
            qidx[: len(qidx_l)] = qidx_l
            idf[: len(idf_l)] = idf_l
        return {"start": start, "len": plen, "qidx": qidx, "idf": idf}

    def search_rows(
        self,
        query: str,
        top_k: int = 10,
        valid_mask: Optional[jnp.ndarray] = None,
        num_rows: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores (k,), rows (k,) int64; -1 padding)."""
        s, r = self.search_rows_batch([query], top_k, valid_mask, num_rows)
        return s[0], r[0]

    def search_rows_batch(
        self,
        queries: Sequence[str],
        top_k: int = 10,
        valid_mask: Optional[jnp.ndarray] = None,
        num_rows: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched BM25 scoring in one device program."""
        bq = len(queries)
        if self.num_docs == 0:
            return (np.full((bq, top_k), -1e30, np.float32),
                    np.full((bq, top_k), -1, np.int64))
        max_row = max(self.doc_lens.keys(), default=-1) + 1
        n_rows = num_rows or _next_pow2(max(max_row, 1), floor=256)
        if valid_mask is not None:
            n_rows = max(n_rows, int(valid_mask.shape[0]))
        self._device_doc_lens(n_rows)
        n_rows = self._dl_size  # pow2 >= everything above
        dl = self._dl_dev

        self._finalize_csr()
        pages = self.make_pages(queries)

        mask = valid_mask
        if mask is not None and int(mask.shape[0]) < n_rows:
            mask = jnp.concatenate([mask, jnp.zeros((n_rows - int(mask.shape[0]),), bool)])

        top_s, top_i = bm25_pages_score_topk(
            self._dev_post_rows, self._dev_post_tf,
            jnp.asarray(pages["start"]), jnp.asarray(pages["len"]),
            jnp.asarray(pages["qidx"]), jnp.asarray(pages["idf"]),
            dl, jnp.asarray(self.avgdl, jnp.float32), mask,
            bq, n_rows, min(top_k, n_rows), self.k1, self.b,
        )
        scores = np.asarray(top_s)
        rows_out = np.asarray(top_i).astype(np.int64)
        if scores.shape[1] < top_k:
            pad = top_k - scores.shape[1]
            scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-1e30)
            rows_out = np.pad(rows_out, ((0, 0), (0, pad)), constant_values=-1)
        return scores, rows_out

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> Dict:
        """v2 format: tokens per row; stats rebuilt on load
        (reference `bm25_index.py:275-327`)."""
        return {
            "version": 2,
            "k1": self.k1,
            "b": self.b,
            "docs": {str(row): toks for row, toks in self.doc_tokens.items()},
        }

    @classmethod
    def from_dict(cls, data: Dict, **kwargs) -> "BM25Index":
        idx = cls(k1=float(data.get("k1", 1.5)), b=float(data.get("b", 0.75)), **kwargs)
        for row, tokens in data.get("docs", {}).items():
            idx.add_document(int(row), list(tokens))
        return idx

    def get_stats(self) -> Dict:
        return {
            "num_docs": self.num_docs,
            "num_terms": len(self.vocab),
            "total_postings": sum(len(p) for p in self.postings),
            "avgdl": self.avgdl,
            "removed_pending": len(self.removed),
        }


class PersistentBM25Index:
    """Thread-safe persistent wrapper (reference `bm25_index.py:330`):
    lazy load, atomic gzip-JSON save, auto-save threshold, store sync.

    Persistence is keyed by doc_id (not device row) so an index file survives
    re-ingestion into a fresh store; rows are resolved through the store at
    load time."""

    def __init__(self, store, path: str = "./data/bm25_index.json.gz",
                 k1: float = 1.5, b: float = 0.75, auto_save_threshold: int = 100,
                 **kwargs) -> None:
        self.store = store
        self.path = path
        self.auto_save_threshold = auto_save_threshold
        self._lock = threading.RLock()
        self._index = BM25Index(k1=k1, b=b, **kwargs)
        self._loaded = False
        self._dirty_adds = 0

    # -- lifecycle ---------------------------------------------------------
    def _ensure_loaded(self) -> None:
        if self._loaded:
            return
        self._loaded = True
        p = Path(self.path)
        if not p.is_file():
            return
        try:
            with gzip.open(p, "rt", encoding="utf-8") as fh:
                data = json.load(fh)
            docs = data.get("docs", {})
            k1 = float(data.get("k1", self._index.k1))
            b = float(data.get("b", self._index.b))
            idx = BM25Index(k1=k1, b=b,
                            max_query_terms=self._index.max_query_terms,
                            max_postings=self._index.max_postings)
            resolved = 0
            for key, tokens in docs.items():
                row = self.store.row_of(key) if hasattr(self.store, "row_of") else None
                if row is not None:
                    idx.add_document(row, list(tokens))
                    resolved += 1
            self._index = idx
            logger.info("loaded BM25 index from %s (%d/%d docs resolved)",
                        p, resolved, len(docs))
        except Exception as exc:
            logger.warning("failed to load BM25 index %s: %s (starting empty)", p, exc)

    def save(self) -> None:
        with self._lock:
            self._ensure_loaded()
            p = Path(self.path)
            p.parent.mkdir(parents=True, exist_ok=True)
            # persist by doc_id, resolved through the store's row map
            docs = {}
            row_to_id = getattr(self.store, "id_for_row", None)
            for row, tokens in self._index.doc_tokens.items():
                key = row_to_id(row) if row_to_id else str(row)
                if key is not None:
                    docs[key] = tokens
            payload = {"version": 2, "k1": self._index.k1, "b": self._index.b, "docs": docs}
            tmp = str(p) + ".tmp"
            with gzip.open(tmp, "wt", encoding="utf-8") as fh:
                json.dump(payload, fh)
            os.replace(tmp, str(p))
            self._dirty_adds = 0

    # -- mutation ----------------------------------------------------------
    def add_document(self, doc_id: str, text: str) -> bool:
        with self._lock:
            self._ensure_loaded()
            row = self.store.row_of(doc_id)
            if row is None:
                return False
            self._index.add_document(row, text)
            self._dirty_adds += 1
            if self._dirty_adds >= self.auto_save_threshold:
                self.save()
            return True

    def remove_document(self, doc_id: str) -> bool:
        with self._lock:
            self._ensure_loaded()
            row = self.store.row_of(doc_id)
            if row is None:
                return False
            return self._index.remove_document(row)

    def build_from_store(self) -> int:
        """Full rebuild from the vector store (reference `bm25_index.py:574`)."""
        with self._lock:
            self._ensure_loaded()
            self._index = BM25Index(k1=self._index.k1, b=self._index.b,
                                    max_query_terms=self._index.max_query_terms,
                                    max_postings=self._index.max_postings)
            n = 0
            for doc_id in self.store.list_doc_ids_with_embeddings():
                doc = self.store.get_doc(doc_id)
                row = self.store.row_of(doc_id)
                if doc is not None and row is not None:
                    self._index.add_document(row, doc.content)
                    n += 1
            self.save()
            return n

    def sync_with_store(self) -> Tuple[int, int]:
        """Diff against store ids; add new, remove stale
        (reference `bm25_index.py:611-652`). Returns (added, removed)."""
        with self._lock:
            self._ensure_loaded()
            store_rows = {}
            for doc_id in self.store.list_doc_ids_with_embeddings():
                row = self.store.row_of(doc_id)
                if row is not None:
                    store_rows[row] = doc_id
            indexed = set(self._index.doc_lens.keys())
            added = removed = 0
            for row in indexed - set(store_rows):
                self._index.remove_document(row)
                removed += 1
            for row, doc_id in store_rows.items():
                if row not in indexed:
                    doc = self.store.get_doc(doc_id)
                    if doc is not None:
                        self._index.add_document(row, doc.content)
                        added += 1
            if added or removed:
                self.save()
            return added, removed

    # -- search ------------------------------------------------------------
    def search(self, query: str, top_k: int = 10) -> List[Tuple[StoredDoc, float]]:
        return self.search_batch([query], top_k)[0]

    def search_batch(self, queries: Sequence[str], top_k: int = 10) -> List[List[Tuple[StoredDoc, float]]]:
        with self._lock:
            self._ensure_loaded()
            valid = getattr(self.store, "valid_mask", None)
            num_rows = getattr(self.store, "row_capacity", None)
            scores, rows = self._index.search_rows_batch(
                queries, top_k,
                valid_mask=valid() if callable(valid) else valid,
                num_rows=num_rows() if callable(num_rows) else num_rows,
            )
        out: List[List[Tuple[StoredDoc, float]]] = []
        for qi in range(len(queries)):
            hits: List[Tuple[StoredDoc, float]] = []
            for s, r in zip(scores[qi], rows[qi]):
                if r < 0 or s <= 0:
                    continue
                doc_id = self.store.id_for_row(int(r))
                if doc_id is None:
                    continue
                doc = self.store.get_doc(doc_id)
                if doc is not None:
                    hits.append((doc, float(s)))
            out.append(hits)
        return out

    def get_stats(self) -> Dict:
        with self._lock:
            self._ensure_loaded()
            return self._index.get_stats()
