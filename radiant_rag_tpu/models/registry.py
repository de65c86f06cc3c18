"""LocalNLPModels: the embed/rerank facade agents depend on.

API parity with reference `llm/local_models.py:81-281` (`embed`,
`embed_single`, `rerank`) backed by the flax Embedder + CrossEncoder instead
of torch sentence-transformers.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from radiant_rag_tpu.config import AppConfig
from radiant_rag_tpu.models.cross_encoder import CrossEncoder
from radiant_rag_tpu.models.embedder import Embedder
from radiant_rag_tpu.utils.cache import EmbeddingCache


class LocalNLPModels:
    def __init__(
        self,
        config: Optional[AppConfig] = None,
        embedder: Optional[Embedder] = None,
        cross_encoder: Optional[CrossEncoder] = None,
    ) -> None:
        cfg = config or AppConfig()
        cache = EmbeddingCache(cfg.cache.embedding_cache_size)
        self.embedder = embedder or Embedder(cfg.embedding, cache=cache)
        self._cross: Optional[CrossEncoder] = cross_encoder
        self._cross_cfg = cfg.cross_encoder

    @property
    def cross_encoder(self) -> CrossEncoder:
        if self._cross is None:  # lazy: rerank may be disabled
            self._cross = CrossEncoder(self._cross_cfg)
        return self._cross

    @property
    def embedding_dimension(self) -> int:
        return self.embedder.embedding_dimension

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        return self.embedder.embed(texts)

    def embed_device(self, texts: Sequence[str], pad_to: int):
        """Device-resident batch embedding (serving fast path; see
        Embedder.embed_device)."""
        return self.embedder.embed_device(texts, pad_to)

    def embed_single(self, text: str) -> np.ndarray:
        return self.embedder.embed_single(text)

    def rerank(self, query: str, docs: Sequence[str], top_k: Optional[int] = None,
               max_chars: int = 3000) -> List[Tuple[int, float]]:
        return self.cross_encoder.rerank(query, docs, top_k=top_k, max_chars=max_chars)
