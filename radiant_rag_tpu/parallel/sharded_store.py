"""ShardedVectorStore: read-only pod-scale serving store.

The serving topology for corpora beyond one chip (SURVEY.md §5.8): a
TpuVectorStore (or its saved snapshot) is frozen into mesh-sharded arrays —
vectors/codes/BM25 sketch/doc-major tables shard by row over ICI, queries
replicate, per-shard top-k merges with collectives. Mutations go to the
source single-chip store; `refresh()` rebuilds the sharded copy (the old copy
keeps serving until the new one is constructed — double-buffered swap).

Implements the BaseVectorStore read surface so retrieval agents and the
orchestrator work unchanged on a pod.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radiant_rag_tpu.index.base import BaseVectorStore
from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.parallel.sharded_index import ShardedFlatIndex, ShardedHybridIndex

logger = logging.getLogger(__name__)

_READ_ONLY_MSG = ("ShardedVectorStore is a read-only serving copy; apply "
                  "writes to the source store and call refresh()")


class ShardedVectorStore(BaseVectorStore):
    def __init__(self, mesh, source_store, bm25_index=None) -> None:
        """source_store: a TpuVectorStore; bm25_index: its BM25Index (inner)
        for hybrid serving (optional — dense-only without it)."""
        self.mesh = mesh
        self.source = source_store
        self._bm25 = bm25_index
        self._flat: Optional[ShardedFlatIndex] = None
        self._hybrid: Optional[ShardedHybridIndex] = None
        self.refresh()

    # -- build / refresh -----------------------------------------------------
    def refresh(self) -> None:
        """Rebuild sharded arrays from the source store's current state."""
        eng = self.source.engine
        state = eng.to_host()
        vecs = state["vecs"]
        valid = state["valid"]
        level = state["level"]
        lang = state["lang"]
        if self._bm25 is not None and vecs.shape[0] > 0:
            new_hybrid = ShardedHybridIndex(self.mesh, vecs, self._bm25, valid=valid)
            # reuse padded shards for level/lang on the flat filters
            flat = new_hybrid  # hybrid extends flat
        elif vecs.shape[0] > 0:
            flat = ShardedFlatIndex(self.mesh, vecs, valid=valid,
                                    level=level, lang=lang)
            new_hybrid = None
        else:
            flat = None
            new_hybrid = None
        # install level/lang shards when built through the hybrid path
        if new_hybrid is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            total = new_hybrid.rows_per_shard * new_hybrid._n_shards
            lvl = np.zeros((total,), np.int8)
            lvl[: len(level)] = level
            lng = np.zeros((total,), np.int32)
            lng[: len(lang)] = lang
            row_sharding = NamedSharding(self.mesh, P(("data", "model"),))
            new_hybrid.level = jax.device_put(lvl, row_sharding)
            new_hybrid.lang = jax.device_put(lng, row_sharding)
        self._flat = flat
        self._hybrid = new_hybrid
        logger.info("sharded store refreshed: %d rows over %s",
                    vecs.shape[0], dict(zip(self.mesh.axis_names,
                                            self.mesh.devices.shape)))

    # -- reads ---------------------------------------------------------------
    def ping(self) -> bool:
        return True

    def get_doc(self, doc_id: str) -> Optional[StoredDoc]:
        return self.source.get_doc(doc_id)

    def has_embedding(self, doc_id: str) -> bool:
        return self.source.has_embedding(doc_id)

    def row_of(self, doc_id: str) -> Optional[int]:
        return self.source.row_of(doc_id)

    def id_for_row(self, row: int) -> Optional[str]:
        return self.source.id_for_row(row)

    def retrieve_by_embedding_batch(
        self,
        embeddings: np.ndarray,
        top_k: int = 10,
        min_similarity: float = 0.0,
        ef_runtime: Optional[int] = None,
        language_filter: Optional[str] = None,
        doc_level_filter: Optional[str] = None,
        quantized: Optional[bool] = None,
    ) -> List[List[Tuple[StoredDoc, float]]]:
        embeddings = np.atleast_2d(np.asarray(embeddings, np.float32))
        b = embeddings.shape[0]
        if self._flat is None:
            return [[] for _ in range(b)]
        from radiant_rag_tpu.index.engine import LEVEL_CODES

        level_code = -1 if not doc_level_filter else LEVEL_CODES.get(
            doc_level_filter, LEVEL_CODES["other"])
        lang_code = -1
        if language_filter:
            lang_code = self.source.lang_codes.get(language_filter, -2)
            if lang_code == -2:
                return [[] for _ in range(b)]
        mode = "exact" if quantized is False else "binary"
        scores, rows = self._flat.search(
            embeddings, top_k, mode=mode,
            level_code=level_code, lang_code=lang_code)
        out: List[List[Tuple[StoredDoc, float]]] = []
        for qi in range(b):
            hits = []
            for s, r in zip(scores[qi], rows[qi]):
                if r < 0 or s < min_similarity:
                    continue
                doc_id = self.source.id_for_row(int(r))
                doc = self.source.get_doc(doc_id) if doc_id else None
                if doc is not None:
                    hits.append((doc, float(s)))
            out.append(hits)
        return out

    def search_hybrid(
        self,
        embeddings: np.ndarray,
        queries_text: Sequence[str],
        top_k: int = 10,
        fused_k: int = 15,
        rrf_k: int = 60,
    ) -> List[List[Tuple[StoredDoc, float]]]:
        """Pod-scale hybrid retrieval, hydrated to documents."""
        if self._hybrid is None:
            raise RuntimeError("hybrid serving requires a BM25 index at build")
        res = self._hybrid.hybrid_search(
            np.atleast_2d(np.asarray(embeddings, np.float32)),
            list(queries_text), dense_k=top_k, bm25_k=top_k,
            fused_k=fused_k, rrf_k=rrf_k)
        scores, rows = res["fused"]
        out = []
        for qi in range(rows.shape[0]):
            hits = []
            for s, r in zip(scores[qi], rows[qi]):
                if r < 0:
                    continue
                doc_id = self.source.id_for_row(int(r))
                doc = self.source.get_doc(doc_id) if doc_id else None
                if doc is not None:
                    hits.append((doc, float(s)))
            out.append(hits)
        return out

    # -- admin / listing ------------------------------------------------------
    def list_doc_ids(self) -> List[str]:
        return self.source.list_doc_ids()

    def list_doc_ids_with_embeddings(self) -> List[str]:
        return self.source.list_doc_ids_with_embeddings()

    def get_index_info(self) -> Dict[str, Any]:
        info = dict(self.source.get_index_info())
        info["backend"] = "tpu-sharded"
        info["mesh"] = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if self._flat is not None:
            info["rows_per_shard"] = self._flat.rows_per_shard
        return info

    def count_documents(self) -> int:
        return self.source.count_documents()

    # -- writes: rejected ------------------------------------------------------
    def upsert(self, content, meta=None, embedding=None) -> str:
        raise NotImplementedError(_READ_ONLY_MSG)

    def delete_doc(self, doc_id: str) -> bool:
        raise NotImplementedError(_READ_ONLY_MSG)

    def drop_index(self) -> None:
        raise NotImplementedError(_READ_ONLY_MSG)
