"""DeviceVectorIndex: HBM-resident dense index engine.

The TPU-native replacement for the reference's external ANN services
(RediSearch HNSW `redis_store.py:689-755`, pgvector `pgvector_store.py:725-748`,
Chroma). The corpus lives on device as:

  vecs   (cap, D)  fp32  L2-normalized embeddings (rescore + exact path)
  codes  (cap, W)  uint32 packed sign bits        (binary Hamming stage 1)
  i8     (cap, D)  int8  calibrated affine codes  (int8 stage 1)
  valid  (cap,)    bool  live-row mask (deletes = mask, compaction later)
  level  (cap,)    int8  doc_level code (leaf/parent/other -> row filters)
  lang   (cap,)    int32 language code
  doc_len(cap,)    f32   BM25 token counts (shared row space with BM25Index)

Rows are append-only with capacity doubling; updates to existing content-hash
ids land in new rows and invalidate the old row (content-hash ids make true
in-place updates meaningless — same content => same id => same vector).

All queries run as single fused jit programs (ops/similarity.py). Filters
(valid/doc_level/language — reference encodes these as RediSearch TagFields,
`redis_store.py:260-276`) are evaluated as device masks inside the scan.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radiant_rag_tpu.ops import quantize as qz
from radiant_rag_tpu.ops import similarity as sim

logger = logging.getLogger(__name__)

LEVEL_CODES: Dict[str, int] = {"leaf": 0, "parent": 1, "other": 2}


def _next_pow2(n: int, floor: int = 1) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


# Capacity rounding: pow2 while small (cheap, few recompiles), then multiples
# of this quantum. Pow2 all the way up wastes real HBM at the 10M tier — a
# 10M-row reserve would pad to 16.78M, inflating every per-row array by 1.67x
# (int8 alone +2.5 GB; the round-4 10M product run OOM'd on exactly this).
# 65536 is TILE_N-aligned (pallas path needs capacity % 1024 == 0).
CAPACITY_QUANTUM = 1 << 16


def _round_capacity(n: int) -> int:
    if n <= CAPACITY_QUANTUM:
        return _next_pow2(max(n, 256))
    return -(-n // CAPACITY_QUANTUM) * CAPACITY_QUANTUM


@partial(jax.jit, donate_argnums=(0,))
def _write_slab(arr: jax.Array, updates: jax.Array, start: jax.Array) -> jax.Array:
    """In-place (donated) row-slab write at dynamic offset."""
    return jax.lax.dynamic_update_slice_in_dim(arr, updates, start, axis=0)


@partial(jax.jit, donate_argnums=(0,))
def _set_rows_false(valid: jax.Array, rows: jax.Array) -> jax.Array:
    return valid.at[rows].set(False, mode="drop")


@jax.jit
def _mask_program(valid, level, lang, level_code, lang_code):
    mask = valid
    mask = mask & jnp.where(level_code < 0, True, level.astype(jnp.int32) == level_code)
    mask = mask & jnp.where(lang_code < 0, True, lang == lang_code)
    return mask


@partial(jax.jit, static_argnames=("k", "kc", "mode", "select"))
def _search_program(
    vecs: jax.Array,
    codes: jax.Array,
    i8: jax.Array,
    i8_scale: jax.Array,
    i8_offset: jax.Array,
    valid: jax.Array,
    level: jax.Array,
    lang: jax.Array,
    queries: jax.Array,  # (B, D) f32 normalized
    qvalid: jax.Array,  # (B,) bool (padding mask for query bucket)
    level_code: jax.Array,  # () int32, -1 = no filter
    lang_code: jax.Array,  # () int32, -1 = no filter
    k: int,
    kc: int,
    mode: str,  # exact | binary | int8
    select: str = "",  # stage-1 selection policy, resolved by the caller
) -> Tuple[jax.Array, jax.Array]:
    mask = valid
    mask = mask & jnp.where(level_code < 0, True, level.astype(jnp.int32) == level_code)
    mask = mask & jnp.where(lang_code < 0, True, lang == lang_code)

    if mode == "exact":
        top_s, top_i = sim.exact_topk(vecs, queries, mask, k)
    elif mode == "binary":
        qbin = qz.pack_binary(queries)
        top_s, top_i = sim.two_stage_topk(
            vecs, queries, mask, k, kc, "hamming",
            binary_codes=codes, qbinary=qbin,
            int8_codes=i8, int8_scale=i8_scale, int8_offset=i8_offset,
            select=select,
        )
    elif mode == "int8":
        top_s, top_i = sim.two_stage_topk(
            vecs, queries, mask, k, kc, "int8",
            int8_codes=i8, int8_scale=i8_scale, int8_offset=i8_offset,
            select=select,
        )
    else:
        raise ValueError(f"unknown search mode: {mode}")

    # Rows that came from masked-out (-inf) scores, or padded queries, are -1.
    top_i = jnp.where(top_s > sim.NEG_INF / 2, top_i, -1)
    top_i = jnp.where(qvalid[:, None], top_i, -1)
    # Pack scores+rows into ONE array: a single device->host fetch (each
    # fetch costs fixed latency through remote-device tunnels). Rows are
    # exact in f32 below 2^24 (16.7M rows/chip).
    return jnp.concatenate([top_s, top_i.astype(jnp.float32)], axis=1)


class DeviceVectorIndex:
    """Append-only device-resident dense index over one row space."""

    # Query-batch padding buckets: one compiled program per (bucket, k, mode).
    # Throughput keeps scaling past 256 (fixed dispatch+fetch amortizes —
    # BENCH_NOTES.md batch ladder: 13.3k/21.6k/28.4k QPS at B=1024/2048/4096,
    # 100k docs); the top bucket a corpus may use is HBM-gated by
    # max_query_bucket() (stage-1 materializes a 4-byte (B, N) buffer per
    # leg: 4096 usable to ~250k rows, 2048 to ~500k, 1024 to ~1.5M).
    QUERY_BUCKETS = (1, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
    # Peak (B, N) 4-byte stage-1 transient budget under SEQUENTIAL leg
    # scheduling. XLA schedules the dense and BM25 legs' (B, N) buffers one
    # after the other, not co-resident — proven on chip: the round-2
    # bf16-select run at 1M x B=2048 ran with an int32 accumulator (8.6 GB)
    # + bf16 copy (4.3 GB) + BM25 f32 scatter (8.6 GB), which cannot coexist
    # in 16 GB HBM, so the budget models the LARGEST single transient plus
    # corpus residency headroom (vecs+i8+codes ~2.2 GB at 1M x 384).
    SCORE_BYTES_CAP = 9 << 30
    # Usable HBM on the target chip (v5e: 15.75 GB physical; keep headroom
    # for outputs/fragmentation). The transient budget is the MINIMUM of
    # SCORE_BYTES_CAP and what residency leaves free (_transient_budget).
    HBM_USABLE_BYTES = int(float(os.environ.get("RAD_HBM_GB", "15.0")) * (1 << 30))

    def __init__(
        self,
        dim: int,
        initial_capacity: int = 4096,
        calibration_sample: int = 4096,
        device=None,
        store_fp32: bool = True,
        vec_dtype: str = "float32",
        use_pallas_scan: bool = False,
        stage1_select: str = "",
    ) -> None:
        """store_fp32=False is the memory-tier mode for very large corpora:
        fp32 vectors are NOT kept in HBM (1.5KB/doc saved at 384-dim);
        rescoring dequantizes int8 candidates instead (recall cost is small —
        the exact path and on-line recalibration become unavailable, so
        calibrate up-front via int8_ranges or the first >=64-row append)."""
        self.dim = dim
        self.words = qz.packed_words(dim)
        self.count = 0
        self.capacity = _round_capacity(max(initial_capacity, 256))
        self.device = device
        self.store_fp32 = store_fp32
        import jax.numpy as _jnp

        self.vec_dtype = _jnp.bfloat16 if vec_dtype == "bfloat16" else _jnp.float32
        self.use_pallas_scan = use_pallas_scan
        # resolve the stage-1 selection policy HERE (host), not inside the
        # jit trace: compiled-program cache keys must be concrete.
        # Auto policy (nothing explicit anywhere): f32 for small corpora
        # (measured faster at 1M x B<=1024: 98.7 vs 107.1 ms — bf16 only
        # adds convert work when HBM pressure is low), bf16 at >=1M rows
        # where the top admitted bucket's (B, N) traffic is HBM-bound
        # (chip-measured at 1M x B=2048: bf16 21.9k pipelined QPS vs f32
        # 15.0k same-day, recall unchanged at 0.988 — BENCH_NOTES r2/r3).
        import os as _os

        explicit = stage1_select or _os.environ.get("RAD_STAGE1_SELECT", "")
        self._select_explicit = bool(explicit)
        self.stage1_select = explicit or self._auto_select()
        self._calibrated = False
        self.calibration_sample = calibration_sample
        self._alloc(self.capacity)
        # identity dequant until calibration
        self.i8_lo = jnp.full((dim,), -1.0, jnp.float32)
        self.i8_hi = jnp.full((dim,), 1.0, jnp.float32)
        # optional graph engine (HNSW-equivalent; built on demand)
        self.graph = None

    def _auto_select(self) -> str:
        """Capacity-aware stage-1 select default (see __init__ comment).

        Above the size where even a modest serving bucket's (B, N) stage-1
        transient no longer fits next to the corpus residency (~9-10M rows
        fp32-free), flip to the bounded-footprint chunked scan — the measured
        10M configuration (BENCH_NOTES: 8.4k QPS at 0.9625 recall in <7 GB).
        Non-chunked stays the default below that: chunked LOSES at 1M
        (round-3 settled result)."""
        if 256 * self.capacity * 4 > self._transient_budget():
            return "bf16_chunked"
        return "bf16" if self.capacity >= (1 << 20) else "f32"

    # -- allocation --------------------------------------------------------
    def _alloc(self, cap: int) -> None:
        self.vecs = jnp.zeros((cap if self.store_fp32 else 0, self.dim), self.vec_dtype)
        self.codes = jnp.zeros((cap, self.words), jnp.uint32)
        self.i8 = jnp.zeros((cap, self.dim), jnp.int8)
        self.valid = jnp.zeros((cap,), bool)
        self.level = jnp.zeros((cap,), jnp.int8)
        self.lang = jnp.zeros((cap,), jnp.int32)
        self.doc_len = jnp.zeros((cap,), jnp.float32)

    def reserve(self, total_rows: int) -> None:
        """Grow capacity for `total_rows` rows in ONE step.

        Every capacity change re-specializes the append/quantize programs at
        the new static shape, so incremental doubling during a bulk load pays
        one recompile per doubling (~seconds each on a tunneled chip;
        BENCH_NOTES "ingest bottleneck isolated"). Callers that know the
        final size (ingest knows its chunk count before upserting) reserve
        once instead."""
        if total_rows > self.capacity:
            self._grow(total_rows, tight=True)

    def _grow(self, need: int, tight: bool = False) -> None:
        # tight (reserve with a known final size): quantum-rounded, no
        # doubling slack — at 10M rows pow2 padding would waste 1.67x HBM
        # on every per-row array. But tight growth is only exact-sized when
        # it at least DOUBLES capacity (a one-shot bulk reserve): honoring
        # exact sizes for a stream of small reserve(count+delta) calls
        # (app.ingest reserves per call) would do a full O(capacity) device
        # copy + append-program recompile per call. Otherwise growth stays
        # amortized: 2x while small, 1.25x once capacity is HBM-relevant
        # (pow2 doubling at 8M rows wastes GBs; 1.25x keeps copies O(log)
        # while bounding slack at 25%).
        if tight and need >= 2 * self.capacity:
            new_cap = _round_capacity(need)
        else:
            amort = (self.capacity * 2 if self.capacity < (1 << 21)
                     else self.capacity + self.capacity // 4)
            new_cap = _round_capacity(max(need, amort))
        logger.info("growing device index %d -> %d rows", self.capacity, new_cap)
        pad = new_cap - self.capacity

        def grow(arr):
            return jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)

        if self.store_fp32:
            self.vecs = grow(self.vecs)
        self.codes = grow(self.codes)
        self.i8 = grow(self.i8)
        self.valid = grow(self.valid)
        self.level = grow(self.level)
        self.lang = grow(self.lang)
        self.doc_len = grow(self.doc_len)
        self.capacity = new_cap
        if not self._select_explicit:
            # growth across the HBM-pressure boundary flips the auto select
            # policy (new programs compile under the new key; cached small-
            # corpus programs are simply unused)
            self.stage1_select = self._auto_select()

    # -- writes ------------------------------------------------------------
    def append(
        self,
        vecs: np.ndarray,  # (P, D) f32, should be L2-normalized
        levels: np.ndarray,  # (P,) int8 codes
        langs: np.ndarray,  # (P,) int32 codes
        doc_lens: np.ndarray,  # (P,) f32 token counts
    ) -> np.ndarray:
        """Append a batch; returns assigned row indices (host int64)."""
        p = int(vecs.shape[0])
        if p == 0:
            return np.zeros((0,), np.int64)
        pad_p = _next_pow2(p, floor=64)
        if self.count + pad_p > self.capacity:
            self._grow(self.count + pad_p)

        def padded(a: np.ndarray, dtype) -> np.ndarray:
            out = np.zeros((pad_p,) + a.shape[1:], dtype)
            out[:p] = a
            return out

        vpad = padded(np.asarray(vecs, np.float32), np.float32)
        start = jnp.asarray(self.count, jnp.int32)
        vdev = jnp.asarray(vpad)
        if not self._calibrated and not self.store_fp32 and p >= 64:
            # fp32-free mode: calibrate from this first batch (no stored fp32
            # to recalibrate from later)
            self.i8_lo, self.i8_hi = qz.calibrate_int8_ranges(vdev[:p])
            self._calibrated = True
        if self.store_fp32:
            self.vecs = _write_slab(self.vecs, vdev.astype(self.vec_dtype), start)
        self.codes = _write_slab(self.codes, qz.pack_binary(vdev), start)
        self.i8 = _write_slab(self.i8, qz.quantize_int8(vdev, self.i8_lo, self.i8_hi), start)
        vmask = np.zeros((pad_p,), bool)
        vmask[:p] = True
        self.valid = _write_slab(self.valid, jnp.asarray(vmask), start)
        self.level = _write_slab(self.level, jnp.asarray(padded(levels, np.int8)), start)
        self.lang = _write_slab(self.lang, jnp.asarray(padded(langs, np.int32)), start)
        self.doc_len = _write_slab(self.doc_len, jnp.asarray(padded(doc_lens, np.float32)), start)

        rows = np.arange(self.count, self.count + p, dtype=np.int64)
        self.count += p
        if not self._calibrated and self.store_fp32 and self.count >= 64:
            self.recalibrate()
        return rows

    def invalidate(self, rows: np.ndarray) -> None:
        if len(rows) == 0:
            return
        self.valid = _set_rows_false(self.valid, jnp.asarray(np.asarray(rows, np.int32)))

    def recalibrate(self) -> None:
        """Compute int8 ranges from stored vectors and requantize everything.

        Reference analog: `tools/calibrate_int8_ranges.py` produces a .npy
        artifact loaded at store init; here calibration is one device program
        over the resident corpus and requantization is free (fp32 vectors are
        already in HBM)."""
        if self.count == 0 or not self.store_fp32:
            return
        n = min(self.count, self.calibration_sample)
        self.i8_lo, self.i8_hi = qz.calibrate_int8_ranges(self.vecs[:n].astype(jnp.float32))
        self.i8 = qz.quantize_int8(self.vecs.astype(jnp.float32), self.i8_lo, self.i8_hi)
        self._calibrated = True

    def set_int8_ranges(self, lo: np.ndarray, hi: np.ndarray) -> None:
        """Load external calibration (reference `redis_store.py:176-181`)."""
        self.i8_lo = jnp.asarray(lo, jnp.float32)
        self.i8_hi = jnp.asarray(hi, jnp.float32)
        if self.store_fp32:
            self.i8 = qz.quantize_int8(self.vecs.astype(jnp.float32), self.i8_lo, self.i8_hi)
        self._calibrated = True

    # -- graph (HNSW-equivalent) -------------------------------------------
    def build_graph(self, degree: int = 16, n_long_edges: int = 4,
                    n_entry_points: int = 16, steps: int = 6) -> None:
        """Build the KNN-graph engine over current rows (`index/graph.py`).

        Like HNSW builds (reference efC=200 insert passes), this is an
        offline step; incremental appends fall back to the flat scan until
        the next build."""
        from radiant_rag_tpu.index.graph import GraphIndex

        if self.count == 0:
            return
        self.graph = GraphIndex(degree=degree, n_long_edges=n_long_edges,
                                n_entry_points=n_entry_points, steps=steps)
        self.graph.build(np.asarray(self.vecs[: self.count]),
                         valid=np.asarray(self.valid[: self.count]))

    def extend_graph(self, max_stale_fraction: float = 0.5,
                     allow_rebuild: bool = True) -> None:
        """Make rows appended since the last build visible to graph search.

        Incremental insert (`GraphIndex.add`: exact out-edges + weakest-edge
        back-edges) — the HNSW-insert analog, replacing the former
        "rebuild or fall back to flat" story. A full rebuild is triggered
        instead once incrementally-inserted rows exceed `max_stale_fraction`
        of the graph (old nodes' edges are only patched, never re-derived);
        allow_rebuild=False skips that escalation (used by the query path,
        which must never absorb an unbounded rebuild — the incremental add
        is O(new x N), a rebuild is O(N x C x iters))."""
        if not self.store_fp32:
            return  # fp32-free mode has no vectors to build edges from
        if self.graph is None or self.graph.built_rows == 0:
            if allow_rebuild:
                self.build_graph()
            return
        built = self.graph.built_rows
        if built >= self.count:
            return
        projected = (self.count - getattr(self.graph, "_full_built_rows", built)) / self.count
        if projected > max_stale_fraction:
            if not allow_rebuild:
                logger.warning(
                    "graph %.0f%% stale (> %.0f%%); serving the stale graph — "
                    "call build_graph()/extend_graph() to refresh",
                    projected * 100, max_stale_fraction * 100)
                return
            self.build_graph(degree=self.graph.degree,
                             n_long_edges=self.graph.n_long_edges,
                             n_entry_points=self.graph.n_entry_points,
                             steps=self.graph.steps)
            return
        self.graph.add(self.vecs, built, self.count - built,
                       valid=np.asarray(self.valid))

    def _graph_search(self, queries: np.ndarray, k: int, ef: int,
                      level_code: int, lang_code: int) -> Tuple[np.ndarray, np.ndarray]:
        mask = _mask_program(self.valid, self.level, self.lang,
                             jnp.asarray(level_code, jnp.int32),
                             jnp.asarray(lang_code, jnp.int32))
        # graph covers rows [0, built_rows); newer rows are masked out here
        # and callers should rebuild or use flat mode for full coverage
        built = self.graph.built_rows
        if built < self.capacity:
            mask = mask & (jnp.arange(self.capacity) < built)
        s, i = self.graph.search(self.vecs[:built], queries, k, ef=ef,
                                 mask=mask[:built])
        return s, i

    # -- queries -----------------------------------------------------------
    def resident_bytes(self) -> int:
        """Device HBM held by the corpus arrays at current capacity."""
        m = self.memory_bytes()
        aux = self.capacity * 10  # valid(1) + level(1) + lang(4) + doc_len(4)
        return sum(m.values()) + aux

    def _transient_budget(self, extra_resident: int = 0) -> int:
        """Bytes available for the peak stage-1 transient: what's left of
        the chip after corpus residency (plus any caller-resident arrays,
        e.g. the hybrid path's BM25 structures), capped by SCORE_BYTES_CAP's
        measured sequential-scheduling model. At <=1M the cap binds (budget
        unchanged vs rounds 2-3); at 10M residency binds — a fixed cap there
        compiled 17 GB programs and OOM'd (round-4 10M product run)."""
        free = self.HBM_USABLE_BYTES - self.resident_bytes() - extra_resident
        return max(0, min(self.SCORE_BYTES_CAP, free))

    def max_query_bucket(self, extra_resident: int = 0,
                         score_gated: bool = False) -> int:
        """Largest usable query bucket for this corpus size (HBM-gated).

        Accounting is 4 bytes per (bucket, capacity) element for the PEAK
        single transient: the BM25 pages leg scatters into an f32 buffer and
        the sketch leg's MXU accumulator is int32, so the widest transient is
        always 4-byte regardless of the select dtype — and XLA schedules the
        two legs' transients sequentially (see SCORE_BYTES_CAP), so the gate
        budgets one such buffer, not two. This admits B=2048 at 1M docs
        (pipelined QPS 15.9k -> 21.5k measured in round 2) and B=4096 to
        ~590k docs. RAD_MAX_QUERY_BUCKET still overrides for deployments
        that validated something else on their chip.

        score_gated=True forces the (B, N) gate even under a chunked dense
        select — the hybrid path passes it because its BM25 legs materialize
        (B, N) regardless of how the dense leg scans (extra_resident carries
        the BM25 device arrays' bytes)."""
        import os

        override = os.environ.get("RAD_MAX_QUERY_BUCKET")
        if override:
            # clamp DOWN to a real bucket: a non-power-of-two override (3000)
            # would otherwise pass this gate while _bucket_of rounds the batch
            # up to the next bucket (4096) — compiling a program larger than
            # the operator validated
            fits = [b for b in self.QUERY_BUCKETS if b <= int(override)]
            return fits[-1] if fits else self.QUERY_BUCKETS[0]
        budget = self._transient_budget(extra_resident)
        if self.stage1_select.endswith("chunked") and not score_gated:
            # chunked stage-1 never materializes (B, N): peak transient is
            # (B, SCAN_CHUNK) — this is the >=10M fp32-free serving
            # configuration. Still bounded by the chunk buffer.
            from radiant_rag_tpu.ops.similarity import SCAN_CHUNK

            cap = self.QUERY_BUCKETS[-1]
            while cap > 1 and cap * SCAN_CHUNK * 4 > budget:
                cap //= 2
            return cap
        cap = self.QUERY_BUCKETS[-1]
        while cap > 1 and cap * self.capacity * 4 > budget:
            cap //= 2
        return cap

    def _bucket_of(self, b: int) -> int:
        """Smallest query-padding bucket holding b queries (host-only)."""
        max_b = self.max_query_bucket()
        if b > max_b:
            raise ValueError(
                f"query batch {b} exceeds max bucket {max_b}; "
                "split the batch (engine.search chunks automatically)")
        for cand in self.QUERY_BUCKETS:
            if b <= cand:
                return cand
        return max_b

    def _bucket_queries(self, queries: np.ndarray) -> Tuple[jax.Array, jax.Array, int]:
        b = queries.shape[0]
        bucket = self._bucket_of(b)
        qpad = np.zeros((bucket, self.dim), np.float32)
        qpad[:b] = queries
        qvalid = np.zeros((bucket,), bool)
        qvalid[:b] = True
        return jnp.asarray(qpad), jnp.asarray(qvalid), b

    def search(
        self,
        queries: np.ndarray,  # (B, D) f32 normalized
        k: int,
        mode: str = "binary",  # exact | binary | int8
        rescore_multiplier: float = 4.0,
        ef_runtime: Optional[int] = None,
        level_code: int = -1,
        lang_code: int = -1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores (B,k) f32, rows (B,k) int64; -1 = no result)."""
        if self.count == 0:
            b = queries.shape[0]
            return np.full((b, k), -1e30, np.float32), np.full((b, k), -1, np.int64)
        if mode in ("graph", "exact") and not self.store_fp32:
            mode = "int8"  # fp32-free mode has no exact vectors
        if mode == "graph" and (self.graph is None or self.graph.built_rows == 0):
            mode = "int8"  # graph not built -> flat fallback
        # graph search never materializes the (B, N) stage-1 score buffer,
        # so it is not subject to the HBM bucket gate
        max_b = (self.QUERY_BUCKETS[-1] if mode == "graph"
                 else self.max_query_bucket())
        if queries.shape[0] > max_b:  # chunk oversized batches
            parts = [self.search(queries[s : s + max_b], k, mode,
                                 rescore_multiplier, ef_runtime, level_code, lang_code)
                     for s in range(0, queries.shape[0], max_b)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        if mode == "graph":
            delta = self.count - self.graph.built_rows
            if 0 < delta <= max(20_000, self.count // 10):
                # rows appended since the last build: insert them
                # incrementally so graph mode serves the full corpus.
                # Bounded: never a full rebuild in the query path, and
                # only modest growth (the insert is O(new x N))
                self.extend_graph(max_stale_fraction=1.0,
                                  allow_rebuild=False)
            elif delta > 0:
                logger.warning(
                    "graph is %d rows behind the corpus — too many for "
                    "query-path insertion; serving the stale graph "
                    "(new rows fall back to flat search callers or an "
                    "explicit build_graph())", delta)
            kg = min(k, self.graph.built_rows)
            s, i = self._graph_search(
                np.asarray(queries, np.float32), kg,
                ef=int(ef_runtime or max(64, 4 * k)),
                level_code=level_code, lang_code=lang_code)
            if kg < k:
                s = np.pad(s, ((0, 0), (0, k - kg)), constant_values=-1e30)
                i = np.pad(i, ((0, 0), (0, k - kg)), constant_values=-1)
            return s, i
        k_eff = min(k, self.capacity)
        kc = int(max(k_eff, round(k_eff * rescore_multiplier)))
        if ef_runtime:
            kc = max(kc, int(ef_runtime))
        kc = min(max(kc, 1), self.capacity)
        from radiant_rag_tpu.ops.pallas_kernels import TILE_N

        if (mode == "int8" and self.use_pallas_scan
                and self.capacity % TILE_N == 0):
            return self._pallas_search(queries, k_eff, kc, level_code, lang_code, k)
        qdev, qvalid, b = self._bucket_queries(np.asarray(queries, np.float32))
        packed = _search_program(
            self.vecs, self.codes, self.i8,
            *qz.int8_scale_offset(self.i8_lo, self.i8_hi),
            self.valid, self.level, self.lang,
            qdev, qvalid,
            jnp.asarray(level_code, jnp.int32), jnp.asarray(lang_code, jnp.int32),
            k_eff, kc, mode, self.stage1_select,
        )
        packed = np.asarray(packed)[:b]  # one fetch
        scores = packed[:, :k_eff]
        rows = packed[:, k_eff:].astype(np.int64)
        if k_eff < k:
            scores = np.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=-1e30)
            rows = np.pad(rows, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, rows

    def _pallas_search(self, queries: np.ndarray, k_eff: int, kc: int,
                       level_code: int, lang_code: int, k: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Fused Pallas stage-1 path (ops/similarity.two_stage_topk_pallas)."""
        qdev, qvalid, b = self._bucket_queries(np.asarray(queries, np.float32))
        mask = _mask_program(self.valid, self.level, self.lang,
                             jnp.asarray(level_code, jnp.int32),
                             jnp.asarray(lang_code, jnp.int32))
        top_s, top_i = sim.two_stage_topk_pallas(
            self.vecs, qdev, mask, k_eff, kc, self.i8,
            *qz.int8_scale_offset(self.i8_lo, self.i8_hi))
        top_i = jnp.where(jnp.asarray(qvalid)[:, None], top_i, -1)
        scores = np.asarray(top_s)[:b]
        rows = np.asarray(top_i)[:b].astype(np.int64)
        if k_eff < k:
            scores = np.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=-1e30)
            rows = np.pad(rows, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, rows

    # -- stats / persistence ----------------------------------------------
    def memory_bytes(self) -> Dict[str, int]:
        itemsize = 2 if self.vec_dtype == jnp.bfloat16 else 4
        return {
            "fp32": (self.capacity * self.dim * itemsize) if self.store_fp32 else 0,
            "binary": self.capacity * self.words * 4,
            "int8": self.capacity * self.dim,
        }

    def to_host(self) -> Dict[str, np.ndarray]:
        n = self.count
        # CHUNKED materialization: a monolithic dequantize/astype of the full
        # corpus allocates an (N, D) f32 ON DEVICE — 15.4 GB at 10M x 384,
        # which OOM'd the round-5 10M product run's save() next to the
        # resident codes. 512k-row chunks bound the device transient to
        # ~0.8 GB while the host assembles the full array.
        step = 1 << 19
        vecs_out = np.empty((n, self.dim), np.float32)
        if not self.store_fp32:
            # reconstruct approximate vectors from int8 (documented precision
            # loss; fp32-free deployments should persist source embeddings
            # upstream if bit-exact reload matters)
            for s in range(0, n, step):
                e = min(n, s + step)
                vecs_out[s:e] = np.asarray(qz.dequantize_int8(
                    self.i8[s:e], self.i8_lo, self.i8_hi))
        else:
            for s in range(0, n, step):
                e = min(n, s + step)
                vecs_out[s:e] = np.asarray(self.vecs[s:e].astype(jnp.float32))
        return {
            "vecs": vecs_out,
            "valid": np.asarray(self.valid[:n]),
            "level": np.asarray(self.level[:n]),
            "lang": np.asarray(self.lang[:n]),
            "doc_len": np.asarray(self.doc_len[:n]),
            "i8_lo": np.asarray(self.i8_lo),
            "i8_hi": np.asarray(self.i8_hi),
        }

    @classmethod
    def from_host(cls, state: Dict[str, np.ndarray], initial_capacity: int = 4096,
                  **engine_kwargs) -> "DeviceVectorIndex":
        vecs = state["vecs"]
        n, dim = vecs.shape
        idx = cls(dim, initial_capacity=max(initial_capacity, n), **engine_kwargs)
        if n:
            idx.append(vecs, state["level"].astype(np.int8), state["lang"].astype(np.int32),
                       state["doc_len"].astype(np.float32))
            if "i8_lo" in state:
                idx.set_int8_ranges(state["i8_lo"], state["i8_hi"])
            dead = np.nonzero(~state["valid"])[0]
            if len(dead):
                idx.invalidate(dead)
        return idx
