"""Host-side document content store.

Holds raw content + metadata keyed by content-hash doc id (the analog of the
reference's Redis hashes `{prefix}:{doc_ns}:{id}` with content/meta fields,
`redis_store.py:414-424`) and the id <-> device-row mapping for embedded docs.
Persisted as gzip-JSONL with atomic tmp+rename (same discipline as the
reference's BM25 persistence, `bm25_index.py:435-447`).
"""

from __future__ import annotations

import gzip
import json
import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from radiant_rag_tpu.index.doc import StoredDoc


class DocStore:
    def __init__(self) -> None:
        self.docs: Dict[str, StoredDoc] = {}
        self.id_to_row: Dict[str, int] = {}  # only docs with embeddings
        self.row_to_id: Dict[int, str] = {}

    # -- membership --------------------------------------------------------
    def put(self, doc: StoredDoc, row: Optional[int] = None) -> None:
        self.docs[doc.doc_id] = doc
        if row is not None:
            old = self.id_to_row.pop(doc.doc_id, None)
            if old is not None:
                self.row_to_id.pop(old, None)
            self.id_to_row[doc.doc_id] = row
            self.row_to_id[row] = doc.doc_id

    def get(self, doc_id: str) -> Optional[StoredDoc]:
        return self.docs.get(doc_id)

    def delete(self, doc_id: str) -> Optional[int]:
        """Remove doc; returns its device row if it had one."""
        self.docs.pop(doc_id, None)
        row = self.id_to_row.pop(doc_id, None)
        if row is not None:
            self.row_to_id.pop(row, None)
        return row

    def has_embedding(self, doc_id: str) -> bool:
        return doc_id in self.id_to_row

    def row_of(self, doc_id: str) -> Optional[int]:
        return self.id_to_row.get(doc_id)

    def ids_for_rows(self, rows: np.ndarray) -> List[Optional[str]]:
        return [self.row_to_id.get(int(r)) if r >= 0 else None for r in rows]

    def __len__(self) -> int:
        return len(self.docs)

    def __iter__(self) -> Iterator[StoredDoc]:
        return iter(self.docs.values())

    def clear(self) -> None:
        self.docs.clear()
        self.id_to_row.clear()
        self.row_to_id.clear()

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = str(p) + ".tmp"
        with gzip.open(tmp, "wt", encoding="utf-8") as fh:
            for doc in self.docs.values():
                fh.write(json.dumps({
                    "doc_id": doc.doc_id,
                    "content": doc.content,
                    "meta": doc.meta,
                    "row": self.id_to_row.get(doc.doc_id, -1),
                }, default=str) + "\n")
        os.replace(tmp, str(p))

    @classmethod
    def load(cls, path: str) -> "DocStore":
        store = cls()
        with gzip.open(path, "rt", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                row = rec.get("row", -1)
                store.put(
                    StoredDoc(rec["doc_id"], rec["content"], rec.get("meta") or {}),
                    row=row if row >= 0 else None,
                )
        return store
