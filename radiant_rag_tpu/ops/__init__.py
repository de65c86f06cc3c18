"""Device compute kernels (jit/XLA + Pallas) for the retrieval engine.

These ops replace every hot numerical loop the reference delegates to external
services or Python (SURVEY.md §2.9): HNSW/exact KNN (RediSearch/pgvector),
Hamming scans, int8 dot + fp32 rescore (`storage/quantization.py:185-222`),
BM25 scoring (`storage/bm25_index.py:218-270`), and RRF fusion
(`agents/fusion.py:79-102`).
"""

from radiant_rag_tpu.ops.similarity import (  # noqa: F401
    exact_topk,
    hamming_scan_topk,
    int8_scan_topk,
    two_stage_topk,
)
from radiant_rag_tpu.ops.quantize import (  # noqa: F401
    pack_binary,
    quantize_int8,
    calibrate_int8_ranges,
)
from radiant_rag_tpu.ops.fusion import rrf_fuse  # noqa: F401
