"""Cross-cutting utilities: logging, metrics, caches, conversation, hashing."""

from radiant_rag_tpu.utils.hashing import make_doc_id  # noqa: F401
from radiant_rag_tpu.utils.metrics import RunMetrics, MetricsCollector, StepMetric  # noqa: F401
from radiant_rag_tpu.utils.cache import EmbeddingCache, QueryCache  # noqa: F401
