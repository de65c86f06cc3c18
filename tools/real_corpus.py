#!/usr/bin/env python
"""Large real-text evaluation corpus from offline sources (VERDICT r3 #1).

Round 3 proved retrieval *fast* at 1M docs but *good* only at 2,000; the
blocker was corpus scale. This builder walks every offline prose source in
the environment — all installed packages' docstrings, markdown/rst/txt docs,
and code-comment blocks, the Python stdlib, and the reference repo — and
yields 130k+ deduplicated chunks of genuinely shared-vocabulary technical
prose (measured: 84,796 docstrings + 47,750 comment blocks + 3,126 doc
paragraphs). That is the scale the reference states its quality-retention
claims at (`/root/reference/docs/BINARY_QUANTIZATION_README.md:130-132`).

Chunks are 120-1200 chars; longer paragraphs split on word boundaries.
Deterministic order (sorted walks + seeded shuffle) so every run sees the
same corpus; cached as jsonl.gz because the walk costs ~3 min of host time.

Usage:
    from real_corpus import load_real_corpus
    chunks = load_real_corpus(n=100_000)   # list[str]
"""

from __future__ import annotations

import ast
import gzip
import itertools
import json
import pathlib
import sys
from typing import Iterator, List

DEFAULT_ROOTS = (
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/lib/python3.12",
    "/root/reference",
)

CACHE_DEFAULT = "/root/repo/data/cache/real_corpus.jsonl.gz"

MIN_LEN, MAX_LEN, SPLIT_LEN = 120, 1200, 700


def _paras(text: str) -> Iterator[str]:
    for para in text.split("\n\n"):
        p = " ".join(para.split())
        if MIN_LEN <= len(p) <= MAX_LEN and not p.startswith(("|", "```", "<")):
            yield p


def _split_long(p: str, limit: int = SPLIT_LEN) -> Iterator[str]:
    if len(p) <= limit:
        yield p
        return
    cur: List[str] = []
    size = 0
    for w in p.split():
        cur.append(w)
        size += len(w) + 1
        if size >= limit:
            yield " ".join(cur)
            cur, size = [], 0
    tail = " ".join(cur)
    if len(tail) >= MIN_LEN:
        yield tail


def _comment_blocks(text: str) -> Iterator[str]:
    block: List[str] = []
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("#") and not s.startswith("#!"):
            block.append(s.lstrip("# "))
        else:
            if block:
                p = " ".join(" ".join(block).split())
                if MIN_LEN <= len(p) <= MAX_LEN:
                    yield p
                block = []
    if block:
        p = " ".join(" ".join(block).split())
        if MIN_LEN <= len(p) <= MAX_LEN:
            yield p


def iter_chunks(roots=DEFAULT_ROOTS) -> Iterator[str]:
    """All chunks, deduplicated by 120-char prefix, deterministic order."""
    seen = set()

    def fresh(p: str) -> bool:
        k = p[:120]
        if k in seen:
            return False
        seen.add(k)
        return True

    for root in roots:
        r = pathlib.Path(root)
        if not r.is_dir():
            continue
        for path in itertools.chain(sorted(r.rglob("*.md")),
                                    sorted(r.rglob("*.rst")),
                                    sorted(r.rglob("*.txt"))):
            try:
                text = path.read_text(errors="ignore")
            except OSError:
                continue
            for p0 in _paras(text):
                for p in _split_long(p0):
                    if fresh(p):
                        yield p
        for path in sorted(r.rglob("*.py")):
            try:
                text = path.read_text(errors="ignore")
            except OSError:
                continue
            try:
                tree = ast.parse(text)
            except Exception:
                tree = None
            if tree is not None:
                for node in ast.walk(tree):
                    if isinstance(node, (ast.Module, ast.ClassDef,
                                         ast.FunctionDef, ast.AsyncFunctionDef)):
                        ds = ast.get_docstring(node)
                        if ds:
                            p0 = " ".join(ds.split())
                            if MIN_LEN <= len(p0) <= MAX_LEN + 200:
                                for p in _split_long(p0):
                                    if fresh(p):
                                        yield p
            for p in _comment_blocks(text):
                if fresh(p):
                    yield p


def build_cache(cache_path: str = CACHE_DEFAULT, roots=DEFAULT_ROOTS) -> int:
    path = pathlib.Path(cache_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with gzip.open(path, "wt") as fh:
        for chunk in iter_chunks(roots):
            fh.write(json.dumps(chunk) + "\n")
            n += 1
    return n


def load_real_corpus(n: int = 100_000, cache_path: str = CACHE_DEFAULT,
                     seed: int = 0) -> List[str]:
    """First n chunks after a seeded shuffle; builds the cache on first use."""
    import numpy as np

    path = pathlib.Path(cache_path)
    if not path.is_file():
        print(f"real_corpus: building cache at {path} (one-time ~3 min walk)",
              file=sys.stderr)
        total = build_cache(cache_path)
        print(f"real_corpus: cached {total} chunks", file=sys.stderr)
    chunks: List[str] = []
    with gzip.open(path, "rt") as fh:
        for line in fh:
            chunks.append(json.loads(line))
    rng = np.random.default_rng(seed)
    rng.shuffle(chunks)
    if len(chunks) < n:
        print(f"real_corpus: only {len(chunks)} chunks available (asked {n})",
              file=sys.stderr)
    return chunks[:n]


if __name__ == "__main__":
    n = build_cache()
    print(json.dumps({"chunks_cached": n, "cache": CACHE_DEFAULT}))
