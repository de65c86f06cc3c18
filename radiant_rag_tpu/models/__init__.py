"""JAX/flax model runtime: embedding bi-encoder + cross-encoder reranker.

Replaces the reference's torch/sentence-transformers inference
(`llm/local_models.py:61-281`: MiniLM-L12 bi-encoder + ms-marco MiniLM
CrossEncoder) with flax modules compiled by XLA for the MXU, sharing the
device runtime with the index engine so ingest embed -> quantize -> append is
one on-device pipeline (SURVEY.md §7.1.3).
"""

from radiant_rag_tpu.models.bert import BertConfig, BertEncoder  # noqa: F401
from radiant_rag_tpu.models.tokenizer import WordPieceTokenizer, HashTokenizer, load_tokenizer  # noqa: F401
from radiant_rag_tpu.models.embedder import Embedder  # noqa: F401
from radiant_rag_tpu.models.cross_encoder import CrossEncoder  # noqa: F401
from radiant_rag_tpu.models.registry import LocalNLPModels  # noqa: F401
