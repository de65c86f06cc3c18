#!/usr/bin/env python
"""Index inspection tool (reference `tools/inspect_index.py`): list sources,
search, fetch by id, stats — against a saved index directory."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json
import sys
from collections import Counter


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Inspect a saved index")
    parser.add_argument("index_dir", help="directory written by store.save()")
    sub = parser.add_subparsers(dest="command")
    sub.add_parser("stats")
    sub.add_parser("sources")
    p = sub.add_parser("get")
    p.add_argument("doc_id")
    p = sub.add_parser("search")
    p.add_argument("query")
    p.add_argument("--top-k", type=int, default=10)
    args = parser.parse_args(argv)

    from radiant_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore.load(args.index_dir)

    if args.command in (None, "stats"):
        print(json.dumps(store.get_index_info(), indent=2))
    elif args.command == "sources":
        counts = Counter(d.source for d in store.docstore)
        for source, n in counts.most_common():
            print(f"{n:6d}  {source}")
    elif args.command == "get":
        doc = store.get_doc(args.doc_id)
        if doc is None:
            print("not found", file=sys.stderr)
            return 1
        print(json.dumps({"doc_id": doc.doc_id, "meta": doc.meta,
                          "content": doc.content}, indent=2))
    elif args.command == "search":
        from radiant_rag_tpu.config import EmbeddingConfig
        from radiant_rag_tpu.models.embedder import Embedder

        emb = Embedder(EmbeddingConfig(dim=store.dim)).embed_single(args.query)
        for i, (doc, score) in enumerate(
                store.retrieve_by_embedding(emb, top_k=args.top_k), 1):
            print(f"{i:2d}. [{score:.4f}] {doc.source}: {doc.content[:100]!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
