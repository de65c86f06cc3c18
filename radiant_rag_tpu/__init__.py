"""radiant_rag_tpu — a TPU-native agentic RAG framework.

A from-scratch JAX/XLA/Pallas re-imagining of the capabilities of the
reference system (dshipley71/radiant-rag): hybrid dense+BM25 retrieval with
RRF fusion, binary/int8 quantization with fp32 rescoring, cross-encoder
reranking, hierarchical document storage with auto-merging, a critic-driven
multi-agent query pipeline, and document/web/GitHub ingestion — with the
retrieval core implemented as a device-resident index engine instead of
external services (reference: Redis/RediSearch `radiant/storage/redis_store.py`,
pgvector `radiant/storage/pgvector_store.py`, python BM25
`radiant/storage/bm25_index.py`, torch sentence-transformers
`radiant/llm/local_models.py`).

Public surface (mirrors reference `radiant/app.py:52` RadiantRAG):

    from radiant_rag_tpu import create_app
    app = create_app()
    app.ingest_documents([...])
    result = app.query("...")
"""

__version__ = "0.1.0"

from radiant_rag_tpu.config import AppConfig, load_config  # noqa: F401


def create_app(config=None, **kwargs):
    """Build a RadiantTPU application facade (reference `app.py:1350`)."""
    from radiant_rag_tpu.app import RadiantTPU

    return RadiantTPU(config=config, **kwargs)
