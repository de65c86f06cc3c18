"""Device-resident index engine: the storage layer of the framework.

Replaces the reference's external storage services (Redis/RediSearch
`storage/redis_store.py`, ChromaDB `storage/chroma_store.py`,
Postgres+pgvector `storage/pgvector_store.py`) and its in-process python BM25
(`storage/bm25_index.py`) with HBM-resident arrays + fused XLA/Pallas scans.
One shared row space backs both the dense and sparse sub-indexes so hybrid
fusion happens on device.
"""

from radiant_rag_tpu.index.doc import StoredDoc  # noqa: F401
from radiant_rag_tpu.index.base import BaseVectorStore  # noqa: F401
from radiant_rag_tpu.index.store import TpuVectorStore  # noqa: F401
from radiant_rag_tpu.index.bm25 import BM25Index, PersistentBM25Index, tokenize  # noqa: F401
from radiant_rag_tpu.index.factory import create_vector_store  # noqa: F401
