"""Device-resident cross-encoder rerank: zero host doc-tokenization at query
time.

The naive rerank path (reference `agents/rerank.py:85-117`: fetch candidate
texts, tokenize (query, doc) pairs, forward) is host-bound at serving batch
sizes — B=2048 queries x K=40 candidates is 82k pair tokenizations per batch
on this host's single core. TPU-first design: tokenize every doc ONCE at
build time into a device token table (N, d_len) int32 (~0.4 GB at 1M docs),
and at query time GATHER candidate token rows on device by row id, assemble
the packed [CLS] q [SEP] d [SEP] pair layout with vectorized index
arithmetic (identical to `tokenizer.encode_batch(pairs=...)` packing, so a
cross-encoder trained on host-tokenized pairs scores identically), and run
the CE forward over pair chunks inside one jitted program. The host only
tokenizes the B query strings.

HBM budget: table = N * d_len * 4 bytes (0.37 GB at 1M, d_len=93) — add
`table_dtype=np.int16` to halve it (vocab 8192 fits; widened on device).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radiant_rag_tpu.models.tokenizer import CLS_ID, PAD_ID, SEP_ID

logger = logging.getLogger(__name__)


class DeviceReranker:
    """Cross-encoder rerank over row ids against a device doc-token table."""

    def __init__(self, cross_encoder, q_len: int = 31, d_len: int = 93,
                 pair_chunk: int = 4096, table_dtype=np.int32) -> None:
        """q_len/d_len: token budgets for the query and doc sides of each
        pair (L = q_len + d_len + 3 with the specials; default 127 -> the
        CE's 128 bucket). pair_chunk bounds the attention transient:
        chunk x heads x L x L x 2B (4096 x 4 x 128 x 128 bf16 = 0.5 GB)."""
        self.ce = cross_encoder
        self.q_len = int(q_len)
        self.d_len = int(d_len)
        self.L = self.q_len + self.d_len + 3
        self.pair_chunk = int(pair_chunk)
        self.table_dtype = table_dtype
        self._table = None  # (N, d_len) device
        self._d_lens = None  # (N,) int32 device
        self.n_rows = 0
        self._programs = {}  # top_k -> jitted program (shapes key the rest)

    # -- build ---------------------------------------------------------------
    def build_table(self, texts: Sequence[str], batch: int = 8192) -> None:
        """Tokenize all docs once (ingest-side cost) into the device table.
        Row i of the table corresponds to engine row i."""
        n = len(texts)
        tok = self.ce.tokenizer
        ids_host = np.full((n, self.d_len), PAD_ID, self.table_dtype)
        lens = np.zeros((n,), np.int32)
        for s in range(0, n, batch):
            chunk = texts[s:s + batch]
            for j, ids in enumerate(tok.tokenize_ids_batch(chunk, cap=self.d_len)):
                m = min(len(ids), self.d_len)
                ids_host[s + j, :m] = ids[:m]
                lens[s + j] = m
        self._table = jax.device_put(ids_host)
        self._d_lens = jax.device_put(lens)
        self.n_rows = n
        self._programs.clear()  # table shape keys the compiled programs
        logger.info("device rerank table: %d docs x %d tokens (%.2f GB HBM)",
                    n, self.d_len, ids_host.nbytes / 1e9)

    def append(self, texts: Sequence[str]) -> None:
        """Extend the table for newly ingested rows (host round-trip of the
        new rows only would need dynamic shapes; the table is small enough
        that a rebuild-concat is the simple correct move)."""
        if self._table is None:
            self.build_table(list(texts))
            return
        tok = self.ce.tokenizer
        m = len(texts)
        ids_host = np.full((m, self.d_len), PAD_ID, self.table_dtype)
        lens = np.zeros((m,), np.int32)
        for j, ids in enumerate(tok.tokenize_ids_batch(list(texts), cap=self.d_len)):
            k = min(len(ids), self.d_len)
            ids_host[j, :k] = ids[:k]
            lens[j] = k
        self._table = jnp.concatenate([self._table, jax.device_put(ids_host)])
        self._d_lens = jnp.concatenate([self._d_lens, jax.device_put(lens)])
        self.n_rows += m
        self._programs.clear()

    # -- the jitted program ---------------------------------------------------
    def _build_program(self, top_k: int):
        L, q_len, d_len = self.L, self.q_len, self.d_len
        chunk = self.pair_chunk
        model = self.ce.model

        @partial(jax.jit, static_argnums=())
        def program(params, table, d_lens, q_ids, q_lens, rows, prior,
                    prior_weight):
            B, K = rows.shape
            nrows = table.shape[0]
            safe = jnp.clip(rows, 0, nrows - 1)
            d_tok = table[safe].astype(jnp.int32)      # (B, K, d_len) gather
            d_len_bk = jnp.minimum(d_lens[safe], d_len)  # (B, K)
            q_tok = jnp.broadcast_to(q_ids[:, None, :], (B, K, q_len))
            ql = jnp.broadcast_to(q_lens[:, None], (B, K))

            # packed [CLS] q[:ql] [SEP] d[:dl] [SEP] layout via index math —
            # identical to tokenizer.encode_batch(pairs=...) so scores match
            # the host-tokenized training/inference distribution.
            pos = jnp.arange(L)[None, None, :]          # (1, 1, L)
            qlx = ql[:, :, None]
            dlx = d_len_bk[:, :, None]
            q_idx = jnp.clip(pos - 1, 0, q_len - 1)
            d_idx = jnp.clip(pos - qlx - 2, 0, d_len - 1)
            seq = jnp.where(
                pos == 0, CLS_ID,
                jnp.where(pos <= qlx, jnp.take_along_axis(q_tok, q_idx, axis=2),
                jnp.where(pos == qlx + 1, SEP_ID,
                jnp.where(pos <= qlx + 1 + dlx,
                          jnp.take_along_axis(d_tok, d_idx, axis=2),
                jnp.where(pos == qlx + dlx + 2, SEP_ID, PAD_ID)))))
            mask = (pos <= qlx + dlx + 2).astype(jnp.int32)
            types = ((pos >= qlx + 2) & (pos <= qlx + dlx + 2)).astype(jnp.int32)

            flat = B * K
            # small batches: don't pad up to the configured chunk (a B=64
            # serving batch x K=40 is 2560 pairs — padding to 8192 would
            # triple the CE work); shapes are static so this is trace-time
            eff_chunk = min(chunk, 1 << (flat - 1).bit_length())
            pad = (-flat) % eff_chunk
            seq_f = jnp.concatenate(
                [seq.reshape(flat, L),
                 jnp.zeros((pad, L), seq.dtype)]).reshape(-1, eff_chunk, L)
            mask_f = jnp.concatenate(
                [mask.reshape(flat, L),
                 jnp.zeros((pad, L), mask.dtype)]).reshape(-1, eff_chunk, L)
            type_f = jnp.concatenate(
                [types.reshape(flat, L),
                 jnp.zeros((pad, L), types.dtype)]).reshape(-1, eff_chunk, L)

            def score_chunk(args):
                s, m, t = args
                return model.apply(params, s, m, t)

            logits = jax.lax.map(score_chunk, (seq_f, mask_f, type_f))
            logits = logits.reshape(-1)[:flat].reshape(B, K)

            # blend with the retrieval prior (z-normalized per query over
            # the live candidates): final = z(CE) + w * z(prior). w=0 is
            # pure CE order, large w degenerates to the incoming hybrid
            # order — so a probe-calibrated w makes the rerank stage unable
            # to LOSE to the ordering it consumes (mirrors fusion="auto").
            live = (rows >= 0).astype(jnp.float32)
            denom = jnp.maximum(live.sum(axis=1, keepdims=True), 1.0)

            def znorm(x):
                mean = (x * live).sum(axis=1, keepdims=True) / denom
                var = (((x - mean) ** 2) * live).sum(axis=1, keepdims=True) / denom
                return (x - mean) / jnp.sqrt(var + 1e-9)

            final = znorm(logits) + prior_weight * znorm(prior)
            final = jnp.where(rows >= 0, final, -jnp.inf)
            order = jnp.argsort(-final, axis=1)[:, :top_k]
            # order by the blend; RETURN the raw CE logits (stable score
            # semantics for downstream consumers, exact host-path parity)
            out_scores = jnp.where(
                jnp.take_along_axis(rows, order, axis=1) >= 0,
                jnp.take_along_axis(logits, order, axis=1), -jnp.inf)
            return out_scores, jnp.take_along_axis(rows, order, axis=1)

        return program

    # -- query-time -----------------------------------------------------------
    def rerank_rows(self, q_texts: Sequence[str], rows: np.ndarray,
                    top_k: int = 10, fetch: bool = True,
                    prior_scores: Optional[np.ndarray] = None,
                    prior_weight: float = 0.0):
        """Rerank hybrid candidates: rows (B, K) int engine row ids (-1 =
        empty). Returns (scores, rows) of shape (B, top_k), ordered by
        z(CE logit) + prior_weight * z(prior_scores) per query (weight 0 =
        pure CE order; calibrate the weight on probes — see
        tools/bench_quality_scale.py). fetch=False returns an unpack()
        thunk (pipelined serving)."""
        if self._table is None:
            raise RuntimeError("build_table() first")
        rows = np.atleast_2d(np.asarray(rows))
        b, k_cand = rows.shape
        if prior_scores is None:
            prior = np.zeros((b, k_cand), np.float32)
            prior_weight = 0.0
        else:
            prior = np.nan_to_num(
                np.asarray(prior_scores, np.float32),
                neginf=0.0, posinf=0.0)
        tok = self.ce.tokenizer
        q_ids_host = np.full((b, self.q_len), PAD_ID, np.int32)
        q_lens = np.zeros((b,), np.int32)
        for i, ids in enumerate(tok.tokenize_ids_batch(list(q_texts),
                                                       cap=self.q_len)):
            m = min(len(ids), self.q_len)
            q_ids_host[i, :m] = ids[:m]
            q_lens[i] = m
        program = self._programs.get(top_k)
        if program is None:
            program = self._programs[top_k] = self._build_program(top_k)
        out = program(self.ce.params, self._table, self._d_lens,
                      jnp.asarray(q_ids_host), jnp.asarray(q_lens),
                      jnp.asarray(rows), jnp.asarray(prior),
                      jnp.float32(prior_weight))
        if not fetch:
            return lambda: tuple(np.asarray(x) for x in jax.device_get(out))
        return tuple(np.asarray(x) for x in jax.device_get(out))
