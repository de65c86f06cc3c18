"""TpuVectorStore: the primary vector store backed by the device index engine.

Replaces all three reference storage backends (`storage/redis_store.py:133`,
`storage/chroma_store.py:47`, `storage/pgvector_store.py:51`) with one
device-resident engine + host docstore. Key behavioral differences, by design
(SURVEY.md §7.1):

  * retrieval is batched-first and fully fused on device (scan -> rescore ->
    top-k in one jit program);
  * the quantized two-stage path is the DEFAULT query engine (the reference
    implements `retrieve_by_embedding_quantized` in every backend but never
    calls it from the pipeline — SURVEY.md §2.1 gap);
  * batch upserts produce the binary/int8 side-cars too (the reference's
    `upsert_batch` skips them, `redis_store.py:476-532`).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radiant_rag_tpu.config import AppConfig, IndexConfig, QuantizationConfig
from radiant_rag_tpu.index.base import BaseVectorStore
from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.index.docstore import DocStore, SpillDocStore, load_docstore
from radiant_rag_tpu.index.engine import DeviceVectorIndex, LEVEL_CODES

logger = logging.getLogger(__name__)


def _normalize(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


class TpuVectorStore(BaseVectorStore):
    def __init__(
        self,
        dim: int = 384,
        index_config: Optional[IndexConfig] = None,
        quantization: Optional[QuantizationConfig] = None,
    ) -> None:
        self.index_config = index_config or IndexConfig(dim=dim)
        self.quantization = quantization or QuantizationConfig()
        self.dim = dim
        if self.index_config.docstore == "spill":
            self.docstore: DocStore = SpillDocStore(
                os.path.join(self.index_config.data_dir, "docs_spill"),
                cache_docs=self.index_config.docstore_cache_docs)
        else:
            self.docstore = DocStore()
        self.engine = DeviceVectorIndex(
            dim, initial_capacity=self.index_config.initial_capacity,
            store_fp32=self.index_config.store_fp32,
            vec_dtype=self.index_config.dtype,
            use_pallas_scan=self.index_config.use_pallas_scan,
            stage1_select=self.index_config.stage1_select,
        )
        self.lang_codes: Dict[str, int] = {}
        if self.quantization.int8_ranges_path and os.path.isfile(self.quantization.int8_ranges_path):
            ranges = np.load(self.quantization.int8_ranges_path)
            self.engine.set_int8_ranges(ranges[0], ranges[1])
            logger.info("loaded int8 calibration from %s", self.quantization.int8_ranges_path)

    # -- helpers -----------------------------------------------------------
    def _lang_code(self, lang: str) -> int:
        if not lang:
            return 0
        code = self.lang_codes.get(lang)
        if code is None:
            code = len(self.lang_codes) + 1
            self.lang_codes[lang] = code
        return code

    def _level_code(self, level: str) -> int:
        return LEVEL_CODES.get(level, LEVEL_CODES["other"])

    @property
    def default_search_mode(self) -> str:
        """Public engine-mode contract for callers that dispatch their own
        engine programs (orchestrator fused hybrid, server): the stage-1 scan
        this store would use for an unqualified search."""
        return self._default_mode()

    def _default_mode(self) -> str:
        """Stage-1 scan for the default (quantized) path.

        precision "both" stores binary AND int8 codes (reference semantics);
        the int8 MXU matmul is the default stage-1 because it is the most
        robust compile on current toolchains — the popcount Hamming scan
        remains selectable via precision="binary" and wins when HBM capacity
        is the binding constraint (48B vs 384B per doc)."""
        q = self.quantization
        if self.index_config.use_graph and self.engine.graph is not None \
                and self.engine.graph.built_rows > 0:
            return "graph"
        if not q.enabled:
            return "exact"
        return {"binary": "binary", "int8": "int8", "both": "int8"}[q.precision]

    def build_graph(self) -> None:
        """Build the HNSW-equivalent graph engine over current rows
        (reference analog: RediSearch index construction with M/efC,
        `redis_store.py:260-276`)."""
        self.engine.build_graph(degree=self.index_config.graph_degree)

    # -- BaseVectorStore ---------------------------------------------------
    def ping(self) -> bool:
        return True

    def reserve(self, additional_docs: int) -> None:
        """Pre-size the device index for a bulk load (one growth instead of
        one recompile-per-doubling; see engine.reserve)."""
        self.engine.reserve(self.engine.count + max(0, int(additional_docs)))

    def upsert(self, content: str, meta: Optional[Dict[str, Any]] = None,
               embedding: Optional[np.ndarray] = None) -> str:
        ids = self.upsert_batch([(content, meta, embedding)])
        return ids[0]

    def upsert_batch(self, docs: Sequence[Tuple[str, Optional[Dict[str, Any]], Optional[np.ndarray]]]) -> List[str]:
        ids: List[str] = []
        emb_rows: List[Tuple[StoredDoc, np.ndarray]] = []
        batch_seen: set = set()  # doc ids scheduled for append in THIS batch
        for content, meta, embedding in docs:
            meta = dict(meta or {})
            doc_id = self.make_doc_id(content, meta)
            doc = StoredDoc(doc_id, content, meta)
            ids.append(doc_id)
            if embedding is None:
                self.docstore.put(doc)
                continue
            old_row = self.docstore.row_of(doc_id)
            if old_row is not None:
                # same content hash => same vector; nothing to update
                self.docstore.put(doc, row=old_row)
                continue
            if doc_id in batch_seen:
                # duplicate within the batch: one engine row is enough; a
                # second append would be displaced at put() time and leak a
                # forever-valid orphan row (consuming top-k slots whose hits
                # are silently dropped).
                continue
            batch_seen.add(doc_id)
            emb_rows.append((doc, np.asarray(embedding, np.float32)))
        if emb_rows:
            vecs = _normalize(np.stack([e for _, e in emb_rows]))
            if vecs.shape[1] != self.engine.dim:
                raise ValueError(
                    f"embedding dim {vecs.shape[1]} != index dim "
                    f"{self.engine.dim}; the index (possibly loaded from "
                    "disk) was built for a different embedder")
            levels = np.asarray([self._level_code(d.doc_level) for d, _ in emb_rows], np.int8)
            langs = np.asarray([self._lang_code(d.language_code) for d, _ in emb_rows], np.int32)
            doc_lens = np.asarray([len(d.content.split()) for d, _ in emb_rows], np.float32)
            rows = self.engine.append(vecs, levels, langs, doc_lens)
            for (doc, _), row in zip(emb_rows, rows):
                displaced = self.docstore.row_of(doc.doc_id)
                if displaced is not None and displaced != int(row):
                    # defensive: never leave an unmapped-but-valid engine row
                    self.engine.invalidate(np.asarray([displaced]))
                self.docstore.put(doc, row=int(row))
        return ids

    def get_doc(self, doc_id: str) -> Optional[StoredDoc]:
        return self.docstore.get(doc_id)

    def has_embedding(self, doc_id: str) -> bool:
        return self.docstore.has_embedding(doc_id)

    def delete_doc(self, doc_id: str) -> bool:
        if self.docstore.get(doc_id) is None:
            return False
        row = self.docstore.delete(doc_id)
        if row is not None:
            self.engine.invalidate(np.asarray([row]))
        return True

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
        embeddings = _normalize(np.atleast_2d(np.asarray(embeddings, np.float32)))
        b = embeddings.shape[0]
        if self.engine.count == 0:
            return [[] for _ in range(b)]
        if quantized is None:
            mode = self._default_mode()
        elif quantized:
            q = self.quantization
            mode = {"binary": "binary", "int8": "int8", "both": "int8"}[q.precision]
        else:
            mode = "exact"
        level_code = -1 if not doc_level_filter else self._level_code(doc_level_filter)
        lang_code = -1
        if language_filter:
            lang_code = self.lang_codes.get(language_filter, -2)  # -2: unknown lang -> no match
        if lang_code == -2:
            return [[] for _ in range(b)]
        scores, rows = self.engine.search(
            embeddings, top_k, mode=mode,
            rescore_multiplier=self.quantization.rescore_multiplier if self.quantization.use_rescoring else 1.0,
            ef_runtime=ef_runtime or (self.index_config.graph_ef_runtime if self.index_config.use_graph else None),
            level_code=level_code, lang_code=lang_code,
        )
        out: List[List[Tuple[StoredDoc, float]]] = []
        for qi in range(b):
            hits: List[Tuple[StoredDoc, float]] = []
            for s, r in zip(scores[qi], rows[qi]):
                if r < 0 or s < min_similarity:
                    continue
                doc_id = self.docstore.row_to_id.get(int(r))
                if doc_id is None:
                    continue
                doc = self.docstore.get(doc_id)
                if doc is not None:
                    hits.append((doc, float(s)))
            out.append(hits)
        return out

    def list_doc_ids(self) -> List[str]:
        return list(self.docstore.docs.keys())

    def list_doc_ids_with_embeddings(self) -> List[str]:
        return list(self.docstore.id_to_row.keys())

    def get_index_info(self) -> Dict[str, Any]:
        mem = self.engine.memory_bytes()
        return {
            "backend": "tpu",
            "dim": self.dim,
            "num_docs": len(self.docstore),
            "num_embedded": len(self.docstore.id_to_row),
            "capacity": self.engine.capacity,
            "rows_used": self.engine.count,
            "default_mode": self._default_mode(),
            "quantization": {
                "enabled": self.quantization.enabled,
                "precision": self.quantization.precision,
                "rescore_multiplier": self.quantization.rescore_multiplier,
                "calibrated": self.engine._calibrated,
            },
            "memory_bytes": mem,
            "languages": dict(self.lang_codes),
        }

    def drop_index(self) -> None:
        self.docstore.clear()
        self.engine = DeviceVectorIndex(
            self.dim, initial_capacity=self.index_config.initial_capacity,
            store_fp32=self.index_config.store_fp32,
            vec_dtype=self.index_config.dtype,
            use_pallas_scan=self.index_config.use_pallas_scan,
            stage1_select=self.index_config.stage1_select)
        self.lang_codes.clear()

    def count_documents(self) -> int:
        return len(self.docstore)

    # -- row-space API (used by BM25 + fusion) -----------------------------
    def row_of(self, doc_id: str) -> Optional[int]:
        return self.docstore.row_of(doc_id)

    def id_for_row(self, row: int) -> Optional[str]:
        return self.docstore.id_for_row(row)

    def valid_mask(self):
        return self.engine.valid

    def row_capacity(self) -> int:
        return self.engine.capacity

    # -- persistence -------------------------------------------------------
    def save(self, directory: str) -> None:
        """Checkpoint the full index: docstore + engine arrays + vocab
        (reference analog: durable Redis/pgvector state, SURVEY.md §5.4)."""
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        # segmented docstore: incremental saves write only the delta. A
        # spill store saving into its own directory persists the index
        # delta in place; exporting to a foreign directory writes the
        # portable in-RAM segmented format under docs/ (docs_spill/ holds
        # ONLY spill-format stores, so load_docstore's dispatch stays flat).
        if isinstance(self.docstore, SpillDocStore):
            spill_dir = d / "docs_spill"
            if spill_dir.resolve() == self.docstore.dir.resolve():
                self.docstore.save()
            else:
                self.docstore.save(str(d / "docs"))
        else:
            self.docstore.save(str(d / "docs"))
        legacy = d / "docs.jsonl.gz"
        if legacy.exists():
            legacy.unlink()  # migrated to docs/ segments
        state = self.engine.to_host()
        tmp = str(d / "engine.tmp.npz")
        np.savez_compressed(tmp, **state)
        os.replace(tmp, str(d / "engine.npz"))
        with open(d / "manifest.json", "w") as fh:
            json.dump({
                "dim": self.dim,
                "lang_codes": self.lang_codes,
                "version": 1,
            }, fh)

    @classmethod
    def load(cls, directory: str, index_config: Optional[IndexConfig] = None,
             quantization: Optional[QuantizationConfig] = None) -> "TpuVectorStore":
        d = Path(directory)
        with open(d / "manifest.json") as fh:
            manifest = json.load(fh)
        store = cls(dim=manifest["dim"], index_config=index_config, quantization=quantization)
        store.lang_codes = {str(k): int(v) for k, v in manifest.get("lang_codes", {}).items()}
        cfg = store.index_config
        docstore = load_docstore(
            str(d), prefer="spill" if cfg.docstore == "spill" else "",
            cache_docs=cfg.docstore_cache_docs)
        with np.load(d / "engine.npz") as z:
            state = {k: z[k] for k in z.files}
        engine = DeviceVectorIndex.from_host(
            state, initial_capacity=store.index_config.initial_capacity,
            stage1_select=store.index_config.stage1_select)
        store.docstore = docstore
        store.engine = engine
        return store
