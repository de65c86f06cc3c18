"""BM25 sparse index: CSR postings (native bulk build) + device scoring.

Capability parity with the reference's `BM25Index`/`PersistentBM25Index`
(`storage/bm25_index.py`): same tokenizer (lowercase alnum-only, len>1,
`bm25_index.py:50-58`), same BM25 variant (k1=1.5, b=0.75, idf =
ln((n-df+0.5)/(df+0.5)+1), `bm25_index.py:134`), incremental adds, gzip-JSON
persistence with atomic replace (`bm25_index.py:420-470`), and
build/sync-from-store (`bm25_index.py:574-652`).

Architecture (vs the reference's O(terms x docs x doclen) python scoring loop,
`bm25_index.py:235-262`):

  host   CSR base (numpy; built in one native C++ pass for bulk loads —
         `native/bm25_build.cpp`) + per-term delta posting lists for
         incremental adds; finalize merges base+delta and uploads to device.
  device two query paths sharing the store's row space so hybrid fusion stays
         on-chip: exact page-table scoring (ops/bm25.bm25_pages_score_topk)
         and the int8 impact-sketch MXU matmul (ops/bm25.bm25_sketch_topk).
"""

from __future__ import annotations

import array
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


def _round_up(n: int, quantum: int) -> int:
    """Smallest multiple of `quantum` >= n (postings padding: pow2 padding
    doubled the device postings arrays at the 10M tier — 600M postings
    padded to 1.07B cost +3.8 GB HBM for nothing; gathers are clamped and
    len-masked, so any size >= total is valid)."""
    return -(-n // quantum) * quantum


def _next_pow2(n: int, floor: int = 64) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class _DeltaLog:
    """Flat append-only (tid, row, tf) posting log for incremental adds.

    O(1) amortized appends (array-module buffers; reference incremental add
    is O(1) per posting too, `bm25_index.py:139-180`) and — unlike the former
    per-term python-list design — merges into the CSR with ONE vectorized
    pass at finalize instead of a per-term python loop. Document updates
    never rewrite the log: `purge_row` records a position watermark and
    entries of that row logged before it are filtered vectorized at merge."""

    __slots__ = ("tids", "rows", "tfs", "dead_before")

    def __init__(self) -> None:
        self.tids = array.array("i")
        self.rows = array.array("i")
        self.tfs = array.array("f")
        self.dead_before: Dict[int, int] = {}  # row -> log watermark

    def append_doc(self, row: int, tid_tf_pairs: Sequence[Tuple[int, int]]) -> None:
        self.tids.extend(tid for tid, _ in tid_tf_pairs)
        self.rows.extend(row for _ in tid_tf_pairs)
        self.tfs.extend(float(tf) for _, tf in tid_tf_pairs)

    def purge_row(self, row: int) -> None:
        self.dead_before[row] = len(self.tids)

    def arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return (np.frombuffer(self.tids, np.int32),
                np.frombuffer(self.rows, np.int32),
                np.frombuffer(self.tfs, np.float32))

    def live_mask(self, removed: Optional[np.ndarray]) -> Optional[np.ndarray]:
        """Bool mask over log entries that survive removals and updates;
        None = all live."""
        if not self.dead_before and removed is None:
            return None
        rows = np.frombuffer(self.rows, np.int32)
        keep = np.ones(len(rows), bool)
        if removed is not None:
            keep &= ~np.isin(rows, removed)
        if self.dead_before:
            size = int(rows.max()) + 1 if len(rows) else 1
            wm = np.zeros(size, np.int64)  # 0 = nothing dead for that row
            for row, pos in self.dead_before.items():
                if row < size:
                    wm[row] = pos
            keep &= np.arange(len(rows)) >= wm[rows]
        return keep

    def __len__(self) -> int:
        return len(self.tids)


_EMPTY_I32 = np.zeros(0, np.int32)
_EMPTY_F32 = np.zeros(0, np.float32)


class BM25Index:
    """Inverted index over device rows: CSR base + incremental delta."""

    def __init__(self, k1: float = 1.5, b: float = 0.75,
                 max_query_terms: int = 32, max_postings: int = 1 << 18,
                 sketch_dim: int = 1024, pages_route_threshold: int = 1 << 15,
                 sketch_hbm_budget_gb: float = 3.0,
                 disc_route_df_frac: float = 0.01,
                 pages_route_max_pages: int = 4096,
                 pages_route_max_cells: int = 1 << 30) -> None:
        self.k1 = k1
        self.b = b
        self.max_query_terms = max_query_terms
        self.max_postings = max_postings
        self.sketch_dim = sketch_dim
        # HBM ceiling for the (N, S) int8 sketch. At the 10M-doc scale the
        # configured S=1024 would cost 10.2 GB — more than fits next to
        # ~4.4 GB of dense codes on a 16 GB chip — so ensure_sketch halves S
        # (power of two, floor 128) until N*S fits the budget and logs the
        # drop. Collisions rise with smaller S; the two-stage exact rescore
        # (doc-major tables) and the pages route for rare-term queries bound
        # the quality cost (docs/QUANTIZATION.md, sketch fidelity study).
        self.sketch_hbm_budget_gb = float(sketch_hbm_budget_gb)
        # configured ceiling — `sketch_dim` is the LIVE value that plan_hbm
        # may reduce (or zero out -> pages-only tier) for the current corpus
        # size; the cfg survives so a rebuild at smaller N restores fidelity
        self._sketch_dim_cfg = sketch_dim
        # doc-major rescore-table width (terms kept per doc for the sketch
        # path's exact rescore; 512-char chunks have ~60 unique terms).
        # plan_hbm reduces it at scale — the table is 8 bytes/term/doc and
        # was the round-4 10M OOM's largest single contributor (10.2 GB).
        self.doc_major_width = 128
        # method='auto' routes a batch to the exact pages path when every
        # query's total posting volume is at most this many postings (rare
        # terms: exact AND cheap; also where hashed-sketch stage-1 is weakest
        # because a singleton term's signal drowns in bin collisions)
        self.pages_route_threshold = pages_route_threshold
        # ...or when the query contains a DISCRIMINATIVE term (df below this
        # fraction of live docs): the 1M router study (BENCH_NOTES) measured
        # the sketch failing exactly on "discriminative term AT volume"
        # queries (signed hashing removes the collision BIAS but not the
        # 1M-doc noise tail that buries a single term's candidates), while
        # the pages path's impact-ordered budget serves them exactly at
        # bounded cost. The sketch keeps only all-common-term traffic, where
        # its score regret at 1M is 2-6% (tie-dense score bands).
        self.disc_route_df_frac = float(disc_route_df_frac)
        # pages COST GATE (round-5 chip study, BENCH_NOTES "pages cost at
        # 1M"): pages ms/batch is ~linear in page count (1.5k pages=0.36 s,
        # 12k=5.3 s, 33k=10 s) and the (B, N) f32 scatter OOMs at
        # b=2048 x 1M — a qualifying batch only routes to pages when its
        # estimated pages and score cells fit these caps
        self.pages_route_max_pages = int(pages_route_max_pages)
        self.pages_route_max_cells = int(pages_route_max_cells)
        # vocabulary
        self.terms: List[str] = []  # tid -> term
        self.vocab: Dict[str, int] = {}
        self.df: List[int] = []
        # CSR base (covers terms [0, len(_base_start)-1))
        self._base_start: np.ndarray = np.zeros(1, np.int64)
        self._base_rows: np.ndarray = _EMPTY_I32
        self._base_tfs: np.ndarray = _EMPTY_F32
        # incremental delta: flat (tid, row, tf) log, merged vectorized
        self.delta = _DeltaLog()
        # per-doc state
        self.doc_terms: Dict[int, List[Tuple[int, int]]] = {}  # row -> [(tid, tf)]
        self.doc_lens: Dict[int, int] = {}
        self.total_len = 0
        self.removed: set = set()
        # rows re-added since the last finalize: their OLD base postings must
        # be filtered at finalize even though the row is live again (the new
        # postings live in the delta). Without this a document update leaves
        # both generations of postings in the CSR and doubles its BM25 score.
        self._stale_base: set = set()
        # device caches
        self._dl_dev: Optional[jnp.ndarray] = None
        self._dl_size = 0
        self._dl_dirty = True
        self._csr_dirty = True
        self._dev_post_rows: Optional[jnp.ndarray] = None
        self._dev_post_tf: Optional[jnp.ndarray] = None
        self._term_start: Optional[np.ndarray] = None  # finalized (T+1,)
        self._term_idf: Optional[np.ndarray] = None
        self._host_post_rows: Optional[np.ndarray] = None
        self._host_post_tf: Optional[np.ndarray] = None
        # impact sketch
        self._sketch: Optional[jnp.ndarray] = None
        self._sketch_scale: Optional[jnp.ndarray] = None
        self._sketch_rows = 0
        self._sketch_dirty = True
        self._term_bin: Dict[int, int] = {}
        self._bins_per_term: Optional[np.ndarray] = None  # tid -> bin (ensure_sketch)
        self._signs_per_term: Optional[np.ndarray] = None  # tid -> ±1 (ensure_sketch)
        # native query tokenizer (vocab snapshot; rebuilt when vocab grows)
        self._qtok = None
        self._qtok_nterms = -1

    # -- build -------------------------------------------------------------
    @property
    def num_docs(self) -> int:
        return len(self.doc_lens)

    @property
    def avgdl(self) -> float:
        return self.total_len / self.num_docs if self.num_docs else 0.0

    def _mark_dirty(self) -> None:
        self._dl_dirty = True
        self._csr_dirty = True
        self._sketch_dirty = True
        self._dm_dirty = True
        # doc-term CSR snapshot (native bulk build) no longer reflects state
        self._dt_csr = None

    def _term_id(self, term: str) -> int:
        tid = self.vocab.get(term)
        if tid is None:
            tid = len(self.terms)
            self.vocab[term] = tid
            self.terms.append(term)
            self.df.append(0)
        return tid

    def add_document(self, row: int, text_or_tokens) -> None:
        tokens = text_or_tokens if isinstance(text_or_tokens, list) else tokenize(text_or_tokens)
        counts: Dict[str, int] = {}
        for t in tokens:
            counts[t] = counts.get(t, 0) + 1
        self.add_document_counts(row, list(counts.items()), len(tokens))

    def add_document_counts(self, row: int, term_counts: Sequence[Tuple[str, int]],
                            length: int) -> None:
        """Add from (term, tf) pairs + token count (the canonical statistics —
        BM25 needs nothing else)."""
        if row in self.doc_lens:
            # document update: eagerly purge the old delta postings (they are
            # indistinguishable from the new ones by row id alone) and mark
            # the row so finalize drops its old BASE postings too.
            self._purge_delta_row(row)
            self._stale_base.add(row)
            self.remove_document(row)
        pairs: List[Tuple[int, int]] = []
        for term, tf in term_counts:
            tid = self._term_id(term)
            self.df[tid] += 1
            pairs.append((tid, int(tf)))
        self.delta.append_doc(row, pairs)
        self.doc_terms[row] = pairs
        self.doc_lens[row] = int(length)
        self.total_len += int(length)
        if row in self.removed:
            # row reuse: the previous occupant's base postings are still dead
            # even though the row itself is live again.
            self._stale_base.add(row)
            self.removed.discard(row)
        self._mark_dirty()

    def _purge_delta_row(self, row: int) -> None:
        """Drop the row's current delta postings (document-update path):
        O(1) watermark — entries of this row logged before now are filtered
        at the vectorized finalize merge."""
        self.delta.purge_row(row)

    def bulk_build(self, rows: Sequence[int], texts: Sequence[str]) -> bool:
        """Bulk (re)index: native C++ single pass when available, python loop
        otherwise. Returns True when the native path ran. Existing contents
        are replaced."""
        self._reset()
        try:
            from radiant_rag_tpu.index.native import bulk_build as native_build

            built = native_build(texts, list(rows))
        except Exception as exc:  # pragma: no cover - defensive
            logger.warning("native bm25 build failed (%s); python fallback", exc)
            built = None
        if built is None:
            for row, text in zip(rows, texts):
                self.add_document(row, text)
            return False
        self.terms = built.terms
        self.vocab = {t: i for i, t in enumerate(built.terms)}
        # term ids were REMAPPED: tid-keyed bin caches are now wrong, not
        # merely stale (incremental adds never remap, so only rebuilds clear)
        self._term_bin = {}
        self._bins_per_term = None
        self._signs_per_term = None
        self.df = built.df.astype(np.int64).tolist()
        self._base_start = built.term_start
        self._base_rows = built.post_rows
        self._base_tfs = built.post_tfs
        self.delta = _DeltaLog()
        self.doc_lens = {int(r): int(l) for r, l in zip(rows, built.doc_lens)}
        self.total_len = int(built.doc_lens.sum())
        dts = built.doc_term_start
        self.doc_terms = {
            int(r): list(zip(built.doc_term_ids[dts[i]: dts[i + 1]].tolist(),
                             built.doc_term_tfs[dts[i]: dts[i + 1]].tolist()))
            for i, r in enumerate(rows)
        }
        self.removed = set()
        self._mark_dirty()
        # keep the CSR doc-term arrays: ensure_doc_major vectorizes from them
        # (valid until the next mutation clears it via _mark_dirty)
        self._dt_csr = (np.asarray(list(rows), np.int64), dts,
                        built.doc_term_ids, built.doc_term_tfs)
        return True

    def _reset(self) -> None:
        self.terms = []
        self.vocab = {}
        self.df = []
        self._base_start = np.zeros(1, np.int64)
        self._base_rows = _EMPTY_I32
        self._base_tfs = _EMPTY_F32
        self.delta = _DeltaLog()
        self.doc_terms = {}
        self.doc_lens = {}
        self.total_len = 0
        self.removed = set()
        self._stale_base = set()
        self._term_bin = {}
        self._bins_per_term = None
        self._signs_per_term = None
        self._mark_dirty()

    def remove_document(self, row: int) -> bool:
        """Lazy removal: mark row dead; postings are purged at the next
        finalize (reference forces a full rebuild on removal,
        `bm25_index.py:182-216`); compaction triggers at >25% dead."""
        if row not in self.doc_lens:
            return False
        self.total_len -= self.doc_lens.pop(row)
        for tid, _tf in self.doc_terms.pop(row, []):
            self.df[tid] = max(0, self.df[tid] - 1)
        self.removed.add(row)
        self._mark_dirty()
        if self.num_docs and len(self.removed) > 0.25 * (self.num_docs + len(self.removed)):
            self.rebuild()
        return True

    def rebuild(self) -> None:
        """Compact: drop dead postings and unused terms."""
        old_terms = self.terms
        docs = [(row, [(old_terms[tid], tf) for tid, tf in pairs], self.doc_lens[row])
                for row, pairs in self.doc_terms.items()]
        self._reset()
        for row, term_counts, length in docs:
            self.add_document_counts(row, term_counts, length)

    # -- stats -------------------------------------------------------------
    def _idf(self, tid: int) -> float:
        n = self.num_docs
        df = self.df[tid]
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def _device_doc_lens(self, num_rows: int) -> jnp.ndarray:
        # exact sizing: callers pass the engine capacity (hybrid asserts
        # _dl_size == capacity) or an already-rounded row count — pow2
        # padding here would desync from the engine's quantum-rounded
        # capacity above CAPACITY_QUANTUM
        if self._dl_dirty or self._dl_size < num_rows:
            size = max(num_rows, 256)
            dl = np.zeros((size,), np.float32)
            for row, ln in self.doc_lens.items():
                if row < size:
                    dl[row] = ln
            self._dl_dev = jnp.asarray(dl)
            self._dl_size = size
            self._dl_dirty = False
        return self._dl_dev

    def _finalize_csr(self) -> None:
        """Merge base + delta into a fresh CSR, drop removed rows, upload."""
        if not self._csr_dirty and self._dev_post_rows is not None:
            return
        t = len(self.terms)
        n_base_terms = len(self._base_start) - 1
        # Base postings of a removed OR re-added (stale) row are dead; delta
        # postings are dead for removed rows and for log entries behind a
        # row's update watermark. One vectorized pass: flatten the base CSR
        # to per-posting tids, filter both sources with array masks, then a
        # stable counting-key sort groups by tid (base entries first, then
        # delta, preserving the previous per-term append order).
        removed_arr = (np.fromiter(self.removed, np.int32, len(self.removed))
                       if self.removed else None)
        base_dead = self.removed | self._stale_base
        base_rows, base_tfs = self._base_rows, self._base_tfs
        base_tids = np.repeat(np.arange(n_base_terms, dtype=np.int32),
                              np.diff(self._base_start))
        if base_dead and len(base_rows):
            base_dead_arr = np.fromiter(base_dead, np.int32, len(base_dead))
            keep = ~np.isin(base_rows, base_dead_arr)
            base_tids, base_rows, base_tfs = base_tids[keep], base_rows[keep], base_tfs[keep]
        d_tids, d_rows, d_tfs = self.delta.arrays()
        d_keep = self.delta.live_mask(removed_arr)
        if d_keep is not None:
            d_tids, d_rows, d_tfs = d_tids[d_keep], d_rows[d_keep], d_tfs[d_keep]
        all_tids = np.concatenate([base_tids, d_tids])
        all_rows = np.concatenate([base_rows, d_rows])
        all_tfs = np.concatenate([base_tfs, d_tfs])
        order = np.argsort(all_tids, kind="stable")
        total = len(order)
        counts = np.bincount(all_tids, minlength=t) if total else np.zeros(t, np.int64)
        starts = np.zeros((t + 1,), np.int64)
        np.cumsum(counts, out=starts[1:])
        size = _round_up(max(total, 1), PAGE_SIZE)
        rows = np.zeros((size,), np.int32)
        tfs = np.zeros((size,), np.float32)
        rows[:total] = all_rows[order]
        tfs[:total] = all_tfs[order]
        # fold the merged CSR back into the base; deltas are absorbed and the
        # stale-row filter has been applied, so the stale set is spent
        self._base_start = starts.copy()
        self._base_rows = rows[:total].copy()
        self._base_tfs = tfs[:total].copy()
        self.delta = _DeltaLog()
        self._stale_base = set()
        self._term_start = starts
        if t:
            n = self.num_docs
            df_arr = np.asarray(self.df, np.float64)
            self._term_idf = np.log((n - df_arr + 0.5) / (df_arr + 0.5) + 1.0).astype(np.float32)
        else:
            self._term_idf = np.zeros(0, np.float32)
        self._host_post_rows = rows
        self._host_post_tf = tfs
        self._dev_post_rows = jnp.asarray(rows)
        self._dev_post_tf = jnp.asarray(tfs)
        self._csr_dirty = False

    # -- impact sketch -----------------------------------------------------
    def _bin_of(self, tid: int) -> int:
        b = self._term_bin.get(tid)
        if b is None:
            from radiant_rag_tpu.utils.hashing import stable_hash32

            b = stable_hash32(self.terms[tid]) % self.sketch_dim
            self._term_bin[tid] = b
        return b

    def _sign_of(self, tid: int) -> int:
        """±1 hashing sign for a term (signed feature hashing): colliding
        terms' impacts CANCEL in expectation instead of inflating every doc
        that contains any collider. Without signs the sketch estimate is
        biased +Σ(colliding impacts) — at 1M docs / 125k terms / S=1024
        (~122 terms/bin) that bias drowned the true signal entirely
        (BENCH_NOTES router-fidelity study: sketch-routed common-term recall
        0.0004 unsigned). Derived from a SALTED second hash so the sign is
        independent of the bin for EVERY sketch width — a bit of the same
        hash would correlate with bin = hash % S once S reaches that bit
        (e.g. S=2^17 covers bit 16), silently degenerating all colliders in
        a bin to one shared sign, i.e. back to the unsigned biased
        estimator."""
        from radiant_rag_tpu.utils.hashing import stable_hash32

        return 1 if stable_hash32("s!" + self.terms[tid]) & 1 else -1

    def _free_sketch_arrays(self) -> None:
        """Drop the sketch-tier device arrays (sketch + doc-major tables)
        so HBM is actually reclaimed when the plan disables the tier."""
        self._sketch = None
        self._sketch_rows = 0
        self._sketch_dirty = True
        self._dm_tids = self._dm_tfs = None
        self._dm_dirty = True

    def plan_hbm(self, num_docs: int) -> None:
        """Fit the sketch path's device structures to the HBM budget.

        The budget (sketch_hbm_budget_gb) covers BOTH per-doc structures the
        MXU sketch path keeps resident: the (N, S) int8 sketch and the
        (N, L) doc-major rescore tables (8 bytes/term/doc — the round-4 10M
        OOM's single largest contributor at L=128). Degrade order, cheapest
        fidelity cost first: L 128->64 (chunks have ~60 unique terms, near
        lossless), then S halves to 128 (collisions rise; the exact rescore
        and the pages route bound the cost — docs/QUANTIZATION.md), then
        L=32, then the sketch tier is DISABLED (sketch_dim=0): the corpus
        serves pages-only, the documented >=10M configuration. Recomputed
        from the configured ceiling each call, so a rebuild at smaller N
        restores fidelity."""
        if self._sketch_dim_cfg <= 0:
            self.sketch_dim = 0
            return
        budget = int(self.sketch_hbm_budget_gb * (1 << 30))
        cands = [(self._sketch_dim_cfg, 128), (self._sketch_dim_cfg, 64)]
        s = self._sketch_dim_cfg // 2
        while s >= 128:
            cands.append((s, 64))
            s //= 2
        cands.append((min(128, self._sketch_dim_cfg), 32))
        plan = next(((ps, pl) for ps, pl in cands
                     if num_docs * (ps + pl * 8) <= budget), None)
        if plan is None:
            if self.sketch_dim != 0:
                logger.warning(
                    "bm25 hbm plan: %d docs cannot fit the sketch tier's "
                    "minimum (S=128 + L=32 doc-major = %.1f GB) in the "
                    "%.1f GB budget; serving PAGES-ONLY (exhaustive-exact "
                    "postings scoring on device).", num_docs,
                    num_docs * (128 + 32 * 8) / (1 << 30),
                    self.sketch_hbm_budget_gb)
            self.sketch_dim = 0
            self._free_sketch_arrays()  # a previously built sketch/doc-major
            # would otherwise stay resident in HBM forever AND be excluded
            # from device_bytes_projected (sketch_dim == 0), undercounting
            # residency exactly where the bucket gate needs it
            return
        ps, pl = plan
        if ps != self.sketch_dim:
            if self.sketch_dim and ps < self.sketch_dim:
                logger.warning(
                    "bm25 hbm plan: %d docs reduce sketch S %d -> %d "
                    "(budget %.1f GB). Rare-term queries still route to "
                    "the exact pages path.", num_docs, self.sketch_dim, ps,
                    self.sketch_hbm_budget_gb)
            self.sketch_dim = ps
            self._term_bin.clear()  # bins depend on S; rehash lazily
            self._bins_per_term = None  # the vectorized cache too — a
            # make_query_* between this plan and the next ensure_sketch
            # must not mix old-S bins with the new-S sketch
            self._sketch_dirty = True
            self._sketch = None  # free the old-S array now (it can be GBs)
        if pl != self.doc_major_width:
            logger.info("bm25 hbm plan: doc-major width %d -> %d at %d docs",
                        self.doc_major_width, pl, num_docs)
            self.doc_major_width = pl
            self._dm_dirty = True
            self._dm_tids = self._dm_tfs = None  # free the old-L tables

    def device_bytes_projected(self, num_docs: int) -> int:
        """Projected device-HBM residency of this index's arrays at
        num_docs rows under the CURRENT plan (call plan_hbm first). Used by
        the hybrid path to shrink the query-bucket gate's transient budget."""
        if self._dev_post_rows is not None:
            post = int(self._dev_post_rows.size) * 8
        elif self._term_start is not None:
            post = _round_up(max(int(self._term_start[-1]), 1), PAGE_SIZE) * 8
        else:
            post = 0
        b = post + num_docs * 4  # doc_lens
        if self.sketch_dim > 0:
            b += num_docs * (self.sketch_dim + self.doc_major_width * 8)
        return b

    def ensure_sketch(self, num_docs: int) -> None:
        """Build/refresh the (num_docs, S) int8 impact sketch on device.

        Each posting's exact BM25 contribution is precomputed (it depends only
        on tf, dl, df, avgdl — all known at finalize) and aggregated into
        hashed term bins host-side with np.bincount (a device scatter into
        num_docs*S elements is pathological at scale); stage-1 BM25 is then an
        int8 MXU matmul (`ops/bm25.py:bm25_sketch_scores`)."""
        self.plan_hbm(num_docs)
        if self.sketch_dim <= 0:
            return
        if not self._sketch_dirty and self._sketch_rows >= num_docs:
            return
        self._finalize_csr()
        avgdl = max(self.avgdl, 1e-6)
        dl_arr = np.zeros((num_docs,), np.float32)
        for row, ln in self.doc_lens.items():
            if row < num_docs:
                dl_arr[row] = ln
        total = int(self._term_start[-1])
        rows = self._host_post_rows[:total]
        tfs = self._host_post_tf[:total]
        # per-posting idf + bin, vectorized via per-term repeat
        t = len(self.terms)
        lengths = np.diff(self._term_start)
        idf_per_post = np.repeat(self._term_idf, lengths)
        bins_per_term = np.asarray([self._bin_of(tid) for tid in range(t)], np.int32)
        self._bins_per_term = bins_per_term
        signs_per_term = np.asarray([self._sign_of(tid) for tid in range(t)], np.int8)
        self._signs_per_term = signs_per_term
        bin_per_post = np.repeat(bins_per_term, lengths)
        dl = dl_arr[np.minimum(rows, num_docs - 1)]
        denom = tfs + self.k1 * (1.0 - self.b + self.b * dl / avgdl)
        # signed impacts (see _sign_of): bins hold Σ sign_t * impact_t, the
        # query side scatters sign_t, so q·sketch is an UNBIASED estimate of
        # Σ impact over the query's own terms — collision noise is zero-mean
        w = (idf_per_post * tfs * (self.k1 + 1.0) / np.maximum(denom, 1e-6)
             ) * np.repeat(signs_per_term, lengths)
        # Host aggregation in the SPARSE domain: ~2.5% of doc x bin cells are
        # nonzero, so aggregate colliding postings per occupied cell (unique +
        # bincount over the compressed index space) and quantize only those —
        # dense float64 ops over num_docs*S cells cost 100+ s at 500k docs,
        # this path is ~10x cheaper and allocates int8 instead of f64.
        flat = rows.astype(np.int64) * self.sketch_dim + bin_per_post
        sketch_host = np.zeros(num_docs * self.sketch_dim, np.int8)
        if flat.size:
            occupied, inv = np.unique(flat, return_inverse=True)
            sums = np.bincount(inv, weights=w.astype(np.float64),
                               minlength=len(occupied))
            scale = max(float(np.abs(sums).max()) / 127.0, 1e-6)
            sketch_host[occupied] = np.clip(np.round(sums / scale), -127, 127
                                            ).astype(np.int8)
        else:
            scale = 1e-6
        self._sketch = jnp.asarray(sketch_host.reshape(num_docs, self.sketch_dim))
        self._sketch_scale = jnp.asarray(scale, jnp.float32)
        self._sketch_rows = num_docs
        self._sketch_dirty = False

    # -- doc-major table (exact candidate rescore) --------------------------
    def ensure_doc_major(self, num_docs: int, max_terms: int = 0) -> None:
        """Build (num_docs, L) device term-id/tf tables for exact candidate
        rescoring after the sketch scan. Docs with more than L unique terms
        keep their L highest-tf terms (512-char chunks have ~60). Default
        width is the HBM plan's (plan_hbm; 128 below ~2M docs)."""
        max_terms = max_terms or self.doc_major_width
        if (not getattr(self, "_dm_dirty", True)
                and getattr(self, "_dm_rows", 0) >= num_docs
                and getattr(self, "_dm_width", 0) == max_terms):
            return
        tids = np.full((num_docs, max_terms), -1, np.int32)
        tfs = np.zeros((num_docs, max_terms), np.int32)
        csr = getattr(self, "_dt_csr", None)
        if csr is not None:
            # vectorized fill from the native bulk-build CSR (no per-doc
            # python loop — ~10x faster at 500k+ docs). Docs over max_terms
            # unique terms (never happens for chunked ingest) fall through to
            # the exact top-tf python path below.
            rows_arr, starts, ids_arr, tfs_arr = csr
            lens = np.diff(starts)
            in_range = rows_arr < num_docs
            short = in_range & (lens <= max_terms)
            ent_keep = np.repeat(short, lens)
            ent_rows = np.repeat(rows_arr, lens)[ent_keep]
            ent_pos = (np.arange(ids_arr.size, dtype=np.int64)
                       - np.repeat(starts[:-1], lens))[ent_keep]
            tids[ent_rows, ent_pos] = ids_arr[ent_keep]
            tfs[ent_rows, ent_pos] = tfs_arr[ent_keep]
            overflow = [(int(r), self.doc_terms[int(r)])
                        for r in rows_arr[in_range & (lens > max_terms)]]
        else:
            overflow = [(row, pairs) for row, pairs in self.doc_terms.items()
                        if row < num_docs]
        for row, pairs in overflow:
            if len(pairs) > max_terms:
                pairs = sorted(pairs, key=lambda p: -p[1])[:max_terms]
            n = len(pairs)
            if n:
                tids[row, :n] = [t for t, _ in pairs]
                tfs[row, :n] = [tf for _, tf in pairs]
        self._dm_tids = jnp.asarray(tids)
        self._dm_tfs = jnp.asarray(tfs)
        self._dm_rows = num_docs
        self._dm_width = max_terms
        self._dm_dirty = False

    def query_tids(self, queries: Sequence[str]) -> np.ndarray:
        """One-pass host query prep: (B, max_query_terms) int32 array of each
        query's unique in-vocab term ids, -1 padded.

        The batched query path needs term ids for four things (indicator,
        exact-rescore terms, routing volume, page tables); tokenizing the
        texts once here instead of once per consumer removes ~2/3 of the
        host-side batch latency, and the native C tokenizer (`index/native.py
        QueryTokenizer`) removes the Python-regex rest — queries never
        materialize as Python token strings (tools/bench_stage_breakdown.py)."""
        t = self.max_query_terms
        qtok = self._query_tokenizer()
        if qtok is not None:
            return qtok.tids_batch(queries, t, t)
        vocab_get = self.vocab.get
        out = np.full((len(queries), t), -1, np.int32)
        for qi, q in enumerate(queries):
            terms = tokenize(q)[:t]
            n = 0
            seen = set()
            for w in terms:
                tid = vocab_get(w)
                if tid is not None and tid not in seen:
                    seen.add(tid)
                    out[qi, n] = tid
                    n += 1
        return out

    def _query_tokenizer(self):
        """Native vocab-snapshot tokenizer, rebuilt when the vocab grows."""
        if self._qtok_nterms != len(self.terms):
            from radiant_rag_tpu.index.native import make_query_tokenizer

            self._qtok = make_query_tokenizer(self.terms)
            self._qtok_nterms = len(self.terms)
        return self._qtok

    def make_query_terms(self, queries: Sequence[str], max_terms: Optional[int] = None,
                         tids: Optional[np.ndarray] = None,
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, T) query term ids (-1 pad) + idfs for exact rescoring."""
        t = max_terms or self.max_query_terms
        if tids is None:
            tids = self.query_tids(queries)
        self._finalize_csr()  # builds _term_idf
        q_tids = np.full((tids.shape[0], t), -1, np.int32)
        width = min(t, tids.shape[1])
        q_tids[:, :width] = tids[:, :width]
        valid = q_tids >= 0
        idf_arr = self._term_idf
        q_idfs = np.where(valid, idf_arr[np.maximum(q_tids, 0)], 0.0).astype(np.float32)
        return q_tids, q_idfs

    def query_posting_volume(self, queries: Sequence[str],
                             tids: Optional[np.ndarray] = None) -> int:
        """Max total posting count any one query's terms touch (requires a
        finalized CSR). The routing signal for auto method selection."""
        self._finalize_csr()
        if tids is None:
            tids = self.query_tids(queries)
        if tids.size == 0:
            return 0
        lengths = np.diff(self._term_start)
        per_tid = np.where(tids >= 0, lengths[np.maximum(tids, 0)], 0)
        return int(per_tid.sum(axis=1).max(initial=0))

    def routes_pages(self, queries: Sequence[str],
                     tids: Optional[np.ndarray] = None,
                     num_docs: int = 0) -> bool:
        """The method='auto' batch router: True -> exact pages path.

        Per query, pages when (a) total posting volume <=
        pages_route_threshold (rare terms: exact AND cheap), or (b) any
        term is discriminative (df <= disc_route_df_frac of live docs) —
        the family the sketch measurably fails at scale (see __init__
        comment / BENCH_NOTES router study). Routing is per BATCH because
        method selects one device program, and the batch goes pages only
        when EVERY query qualifies: a lone all-common-term query keeps the
        whole batch on the sketch (its pages cost is fine, but the common
        query would eat most of the impact-ordered postings budget).
        Per-request serving is b=1, so single-user traffic routes per
        query (measured at par with the sketch there: ~0.9-1.1x ms/batch).

        COST GATE (round-5 chip study at 1M, BENCH_NOTES): even a fully
        qualifying batch stays on the sketch when its estimated page count
        exceeds pages_route_max_pages (pages ms/batch is ~linear in pages:
        1.5k=0.36 s, 12k=5.3 s vs a flat ~0.1 s sketch) or its (B, N)
        score matrix exceeds pages_route_max_cells (the f32 scatter buffer
        OOMs at b=2048 x 1M). The sketch's exact doc-major rescore bounds
        the quality cost of the fallback."""
        self._finalize_csr()
        if tids is None:
            tids = self.query_tids(queries)
        if tids.size == 0:
            return True
        lengths = np.diff(self._term_start)
        per_tid = np.where(tids >= 0, lengths[np.maximum(tids, 0)], 0)
        small = per_tid.sum(axis=1) <= self.pages_route_threshold
        df_cap = max(1.0, self.disc_route_df_frac * max(len(self.doc_lens), 1))
        has_disc = ((per_tid > 0) & (per_tid <= df_cap)).any(axis=1)
        if not bool(np.all(small | has_disc)):
            return False
        n_pages = int(np.ceil(per_tid / PAGE_SIZE).sum())
        if n_pages > self.pages_route_max_pages:
            return False
        n = int(num_docs) or len(self.doc_lens)
        return tids.shape[0] * n <= self.pages_route_max_cells

    def make_query_bins(self, queries: Sequence[str],
                        tids: Optional[np.ndarray] = None) -> np.ndarray:
        """(B, T) SIGNED sketch-bin codes of each query's terms: the value
        is (bin + 1) * sign_of(term) with 0 = pad, so the hashing sign
        (see `_sign_of`) rides the same int16 without a new blob section.
        int32 when sketch_dim exceeds the int16 encoding range.

        The SPARSE form of `make_query_indicator`: the device program
        scatter-adds sign into the dense (B, S) indicator, so the host
        ships 2 bytes per query term instead of S bytes per query (the
        indicator upload was the largest slice of per-batch h2d traffic —
        tools/profile_host_dispatch.py)."""
        if tids is None:
            tids = self.query_tids(queries)
        dt = np.int16 if self.sketch_dim <= (1 << 15) - 2 else np.int32
        out = np.zeros(tids.shape, dt)
        bins, signs = self._bins_per_term, self._signs_per_term
        qidx, pos = np.nonzero(tids >= 0)
        if len(qidx) == 0:
            return out
        flat_tids = tids[qidx, pos]
        if (bins is not None and signs is not None
                and len(bins) > int(flat_tids.max(initial=-1))):
            out[qidx, pos] = ((bins[flat_tids] + 1)
                              * signs[flat_tids]).astype(dt)
        else:
            for q, p, tid in zip(qidx, pos, flat_tids):
                out[q, p] = (self._bin_of(int(tid)) + 1) * self._sign_of(int(tid))
        return out

    def make_query_indicator(self, queries: Sequence[str],
                             tids: Optional[np.ndarray] = None) -> np.ndarray:
        """(B, S) int8 SIGNED indicator over each query's terms' bins
        (each term adds its hashing sign — see `_sign_of`)."""
        if tids is None:
            tids = self.query_tids(queries)
        out = np.zeros((tids.shape[0], self.sketch_dim), np.int8)
        # vocab may have grown since the sketch build; term ids are append-only
        # (only full rebuilds remap, and those clear _bins_per_term), so new
        # tids fall back to _bin_of until the next ensure_sketch
        bins, signs = self._bins_per_term, self._signs_per_term
        qidx, pos = np.nonzero(tids >= 0)
        if len(qidx) == 0:
            return out
        flat_tids = tids[qidx, pos]
        if (bins is not None and signs is not None
                and len(bins) > int(flat_tids.max(initial=-1))):
            np.add.at(out, (qidx, bins[flat_tids]), signs[flat_tids])
        else:
            for q, tid in zip(qidx, flat_tids):
                out[q, self._bin_of(int(tid))] += self._sign_of(int(tid))
        return out

    # -- page table --------------------------------------------------------
    def make_pages(self, queries: Sequence[str],
                   tids_per_q: Optional[List[List[int]]] = None) -> Dict[str, np.ndarray]:
        """Build the per-batch page table (host; KBs). Each page covers
        PAGE_SIZE consecutive postings of one (query, term); the per-query
        posting budget favors rare (high-idf) terms first."""
        if tids_per_q is None:
            tids_per_q = self.query_tids(queries)
        starts_l: List[int] = []
        lens_l: List[int] = []
        qidx_l: List[int] = []
        idf_l: List[float] = []
        for qi, uniq in enumerate(tids_per_q):
            # query_tids() hands back (B, T) arrays padded with -1; a pad's
            # term_start[0]-term_start[-1] is negative and would INFLATE the
            # per-query posting budget, disabling the max_postings cap
            tids = [int(t) for t in uniq if t >= 0]
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

    # -- search ------------------------------------------------------------
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
        method: str = "auto",  # auto | sketch | pages
        rescore_multiplier: float = 4.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched BM25 scoring in one device program.

        method='pages' traverses every query term's posting list under the
        impact-ordered budget (exact within it); 'sketch' scans the SIGNED
        int8 impact sketch (see `_sign_of`) and EXACTLY rescores the
        top-(k x rescore_multiplier) candidates — returned docs carry exact
        scores, ~10x faster on common-term queries, recall bounded by the
        candidate margin. The honest caveats (BENCH_NOTES "router fidelity
        at 1M", docs/QUANTIZATION.md): all-common-term queries keep a small
        exact-score regret (tie-dense bands; ~6% top-10 at 1M product
        depth), and a lone discriminative term at high posting volume is
        still buried by hashing noise — 'auto' (routes_pages) therefore
        sends rare-term AND discriminative-term queries to pages; raise
        rescore_multiplier where exact common-word-tail fidelity matters."""
        bq = len(queries)
        if self.num_docs == 0:
            return (np.full((bq, top_k), -1e30, np.float32),
                    np.full((bq, top_k), -1, np.int64))
        max_row = max(self.doc_lens.keys(), default=-1) + 1
        if num_rows:
            n_rows = num_rows
        else:
            # standalone default: round EXACTLY like the engine rounds its
            # capacity (pow2 small, 64k quanta large). A pow2 default here
            # could size _dl_dev ABOVE a quantum-rounded engine capacity,
            # and the hybrid path asserts _dl_size == capacity.
            from radiant_rag_tpu.index.engine import _round_capacity

            n_rows = _round_capacity(max(max_row, 1))
        if valid_mask is not None:
            n_rows = max(n_rows, int(valid_mask.shape[0]))
        self._device_doc_lens(n_rows)
        n_rows = self._dl_size  # >= everything above
        dl = self._dl_dev

        self._finalize_csr()
        self.plan_hbm(n_rows)  # may disable the sketch tier at scale
        tids_list = self.query_tids(queries)  # tokenize ONCE per batch

        mask = valid_mask
        if mask is not None and int(mask.shape[0]) < n_rows:
            mask = jnp.concatenate([mask, jnp.zeros((n_rows - int(mask.shape[0]),), bool)])

        if method == "auto":
            if self.sketch_dim <= 0:
                method = "pages"
            else:
                # exact pages path for rare-term AND discriminative-term
                # queries (routes_pages); sketch only for all-common-term
                # traffic at volume
                method = ("pages" if self.routes_pages(
                              queries, tids_list, num_docs=n_rows)
                          else "sketch")
        if method == "sketch" and self.sketch_dim <= 0:
            # explicit sketch request at a corpus size the HBM plan serves
            # pages-only (plan_hbm above) — honor the budget, not the arg
            method = "pages"
        if method == "sketch":
            from radiant_rag_tpu.ops.bm25 import bm25_sketch_rescore_topk

            self.ensure_sketch(n_rows)
            self.ensure_doc_major(n_rows)
            qind = self.make_query_indicator(queries, tids_list)
            q_tids, q_idfs = self.make_query_terms(queries, tids=tids_list)
            k_eff = min(top_k, n_rows)
            kc = min(max(k_eff, int(round(k_eff * rescore_multiplier))), n_rows)
            top_s, top_i = bm25_sketch_rescore_topk(
                self._sketch, self._sketch_scale, jnp.asarray(qind),
                self._dm_tids, self._dm_tfs, dl,
                jnp.asarray(self.avgdl, jnp.float32),
                jnp.asarray(q_tids), jnp.asarray(q_idfs), mask,
                k_eff, kc, self.k1, self.b)
            scores = np.asarray(top_s)
            rows_out = np.asarray(top_i).astype(np.int64)
            if scores.shape[1] < top_k:
                pad = top_k - scores.shape[1]
                scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-1e30)
                rows_out = np.pad(rows_out, ((0, 0), (0, pad)), constant_values=-1)
            return scores, rows_out

        pages = self.make_pages(queries, tids_list)
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
        """v3 format: per-row (term, tf) pairs + length; stats rebuilt on
        load (reference's v2 stores raw token lists, `bm25_index.py:275-327` —
        counts are the sufficient statistic)."""
        return {
            "version": 3,
            "k1": self.k1,
            "b": self.b,
            "docs": {
                str(row): {"l": self.doc_lens[row],
                           "t": [[self.terms[tid], tf] for tid, tf in pairs]}
                for row, pairs in self.doc_terms.items()
            },
        }

    @classmethod
    def from_dict(cls, data: Dict, **kwargs) -> "BM25Index":
        idx = cls(k1=float(data.get("k1", 1.5)), b=float(data.get("b", 0.75)), **kwargs)
        for row, payload in data.get("docs", {}).items():
            if isinstance(payload, dict):  # v3
                idx.add_document_counts(
                    int(row), [(t, int(tf)) for t, tf in payload["t"]],
                    int(payload["l"]))
            else:  # v2 token lists
                idx.add_document(int(row), list(payload))
        return idx

    def doc_payload(self, row: int) -> Optional[Dict]:
        """Persistence payload for one row (used by PersistentBM25Index)."""
        pairs = self.doc_terms.get(row)
        if pairs is None:
            return None
        return {"l": self.doc_lens[row],
                "t": [[self.terms[tid], tf] for tid, tf in pairs]}

    def get_stats(self) -> Dict:
        return {
            "num_docs": self.num_docs,
            "num_terms": len(self.terms),
            "total_postings": int(self._base_start[-1]) + len(self.delta),
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
                 persist_max_docs: int = 200000, auto_build: bool = True,
                 **kwargs) -> None:
        self.store = store
        self.path = path
        self.auto_save_threshold = auto_save_threshold
        self.persist_max_docs = persist_max_docs
        self.auto_build = auto_build
        self._lock = threading.RLock()
        self._index = BM25Index(k1=k1, b=b, **kwargs)
        self._loaded = False
        self._dirty_adds = 0

    @property
    def index(self) -> BM25Index:
        """The live inner index (loads/auto-builds on first access).

        Always resolve through this property: load and build_from_store
        REPLACE the inner object, so holding a direct `_index` reference goes
        stale (e.g. a fused HybridSearcher constructed before the first
        load)."""
        with self._lock:
            self._ensure_loaded()
            return self._index

    # -- lifecycle ---------------------------------------------------------
    def _ensure_loaded(self, auto_build: bool = True) -> None:
        if self._loaded:
            return
        self._loaded = True
        p = Path(self.path)
        if not p.is_file():
            # No persisted index: BM25 statistics are fully derivable from the
            # store, and the native bulk build is fast (seconds at 1M docs) —
            # rebuild instead of starting empty (also the load path for
            # corpora above persist_max_docs, whose JSON persistence is
            # intentionally skipped).
            if auto_build and self.auto_build:
                try:
                    ids = self.store.list_doc_ids_with_embeddings()
                except Exception:
                    ids = []
                if ids:
                    self._build_from_store_locked()
            return
        try:
            with gzip.open(p, "rt", encoding="utf-8") as fh:
                data = json.load(fh)
            docs = data.get("docs", {})
            if not docs and "doc_ids" in data:
                # Reference v1/v2 format: parallel doc_ids/doc_tokens lists
                # (`bm25_index.py:275-327`). Migrate by zipping into the
                # doc_id-keyed shape; saved back out as v3 on next save().
                docs = dict(zip(data.get("doc_ids", []),
                                data.get("doc_tokens", [])))
            idx = BM25Index(k1=float(data.get("k1", self._index.k1)),
                            b=float(data.get("b", self._index.b)),
                            max_query_terms=self._index.max_query_terms,
                            max_postings=self._index.max_postings,
                            sketch_dim=self._index._sketch_dim_cfg,
                            pages_route_threshold=self._index.pages_route_threshold,
                            sketch_hbm_budget_gb=self._index.sketch_hbm_budget_gb,
                            disc_route_df_frac=self._index.disc_route_df_frac,
                            pages_route_max_pages=self._index.pages_route_max_pages,
                            pages_route_max_cells=self._index.pages_route_max_cells)
            resolved = 0
            for key, payload in docs.items():
                row = self.store.row_of(key) if hasattr(self.store, "row_of") else None
                if row is None:
                    continue
                if isinstance(payload, dict):
                    idx.add_document_counts(
                        row, [(t, int(tf)) for t, tf in payload["t"]],
                        int(payload["l"]))
                else:
                    idx.add_document(row, list(payload))
                resolved += 1
            self._index = idx
            logger.info("loaded BM25 index from %s (%d/%d docs resolved)",
                        p, resolved, len(docs))
            if resolved == 0 and auto_build and self.auto_build:
                # Nothing in the file resolved against this store (foreign or
                # empty index file) — don't let it mask the rebuild path.
                try:
                    ids = self.store.list_doc_ids_with_embeddings()
                except Exception:
                    ids = []
                if ids:
                    logger.info("BM25 file resolved 0 docs against a non-empty "
                                "store; rebuilding from store")
                    self._build_from_store_locked()
        except Exception as exc:
            logger.warning("failed to load BM25 index %s: %s (starting empty)", p, exc)

    def save(self) -> None:
        with self._lock:
            self._ensure_loaded()
            if self._index.num_docs > self.persist_max_docs:
                logger.info(
                    "BM25 persistence skipped (%d docs > persist_max_docs=%d); "
                    "index rebuilds from the store on load",
                    self._index.num_docs, self.persist_max_docs)
                self._dirty_adds = 0
                return
            p = Path(self.path)
            p.parent.mkdir(parents=True, exist_ok=True)
            docs = {}
            row_to_id = getattr(self.store, "id_for_row", None)
            for row in self._index.doc_terms:
                key = row_to_id(row) if row_to_id else str(row)
                if key is not None:
                    docs[key] = self._index.doc_payload(row)
            payload = {"version": 3, "k1": self._index.k1, "b": self._index.b,
                       "docs": docs}
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
        """Full rebuild from the vector store in one native bulk pass
        (reference `bm25_index.py:574`)."""
        with self._lock:
            self._loaded = True  # building IS the load
            return self._build_from_store_locked()

    def _build_from_store_locked(self) -> int:
        if True:
            rows: List[int] = []
            texts: List[str] = []
            for doc_id in self.store.list_doc_ids_with_embeddings():
                doc = self.store.get_doc(doc_id)
                row = self.store.row_of(doc_id)
                if doc is not None and row is not None:
                    rows.append(row)
                    texts.append(doc.content)
            self._index = BM25Index(k1=self._index.k1, b=self._index.b,
                                    max_query_terms=self._index.max_query_terms,
                                    max_postings=self._index.max_postings,
                                    sketch_dim=self._index._sketch_dim_cfg,
                                    pages_route_threshold=self._index.pages_route_threshold,
                                    sketch_hbm_budget_gb=self._index.sketch_hbm_budget_gb,
                                    disc_route_df_frac=self._index.disc_route_df_frac,
                                    pages_route_max_pages=self._index.pages_route_max_pages,
                                    pages_route_max_cells=self._index.pages_route_max_cells)
            self._index.bulk_build(rows, texts)
            self.save()
            return len(rows)

    def sync_with_store(self) -> Tuple[int, int]:
        """Diff against store ids; add new, remove stale
        (reference `bm25_index.py:611-652`). Returns (added, removed)."""
        with self._lock:
            # no auto-build here: sync itself is about to diff-and-add, and
            # counting an auto-build as zero "added" would misreport ingests
            self._ensure_loaded(auto_build=False)
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
            new_rows: List[int] = []
            new_texts: List[str] = []
            for row, doc_id in store_rows.items():
                if row not in indexed:
                    doc = self.store.get_doc(doc_id)
                    if doc is not None:
                        new_rows.append(row)
                        new_texts.append(doc.content)
            if new_rows:
                if not indexed and not removed:
                    self._index.bulk_build(new_rows, new_texts)  # fresh: native path
                else:
                    for row, text in zip(new_rows, new_texts):
                        self._index.add_document(row, text)
                added = len(new_rows)
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
