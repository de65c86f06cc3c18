"""Cross-encoder reranker: (query, doc) pairs -> relevance scores on device.

Replaces the reference's torch `CrossEncoder.predict`
(`llm/local_models.py:251-281`) with a flax BERT pair-encoder
(BertForSequenceClassification shape: encoder -> CLS -> tanh pooler ->
1-logit classifier) jitted with bucketed shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from radiant_rag_tpu.config import CrossEncoderConfig
from radiant_rag_tpu.models.bert import BertConfig, BertEncoder
from radiant_rag_tpu.models.embedder import _batch_bucket
from radiant_rag_tpu.models.tokenizer import load_tokenizer


class CrossEncoderModel(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids):
        hidden = BertEncoder(self.cfg, name="bert")(input_ids, attention_mask, token_type_ids)
        cls = hidden[:, 0, :].astype(jnp.float32)
        pooled = jnp.tanh(nn.Dense(self.cfg.hidden_size, dtype=jnp.float32, name="pooler")(cls))
        logit = nn.Dense(1, dtype=jnp.float32, name="classifier")(pooled)
        return logit[:, 0]


class CrossEncoder:
    def __init__(
        self,
        config: Optional[CrossEncoderConfig] = None,
        bert_cfg: Optional[BertConfig] = None,
        params: Optional[Dict] = None,
        seed: int = 1,
    ) -> None:
        self.config = config or CrossEncoderConfig()
        c = self.config
        self.bert_cfg = bert_cfg or BertConfig(
            vocab_size=getattr(c, "vocab_size", 30522),
            hidden_size=getattr(c, "dim", 384),
            num_layers=getattr(c, "num_layers", 12),
            num_heads=getattr(c, "num_heads", 12),
            intermediate_size=getattr(c, "hidden_dim", 1536),
            dtype=jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32,
        )
        self.model = CrossEncoderModel(self.bert_cfg)
        self.tokenizer = load_tokenizer(self.config.weights_path, self.bert_cfg.vocab_size)
        if params is not None:
            self.params = params
        else:
            loaded = None
            if self.config.weights_path:
                from radiant_rag_tpu.models.hf_loading import try_load_cross_encoder_params

                loaded = try_load_cross_encoder_params(self.config.weights_path, self.bert_cfg)
            if loaded is None:
                # shipped pretrained reranker (trained listwise on the 100k
                # real-text corpus) when the architecture matches
                from radiant_rag_tpu.models.pretrained import (
                    shipped_cross_encoder_params,
                )

                rng = jax.random.PRNGKey(seed)
                dummy = jnp.zeros((1, 16), jnp.int32)
                template = self.model.init(
                    rng, dummy, jnp.ones((1, 16), jnp.int32), dummy)
                loaded = shipped_cross_encoder_params(self.bert_cfg, template)
                if loaded is None:
                    loaded = template
            self.params = loaded
        self._forward = jax.jit(lambda p, i, a, t: self.model.apply(p, i, a, t))

    def score_pairs(self, pairs: Sequence[Tuple[str, str]]) -> np.ndarray:
        """Relevance score per (query, doc) pair."""
        if not pairs:
            return np.zeros((0,), np.float32)
        bs = self.config.batch_size
        pending = []  # async dispatch; fetch once (see embedder._compute)
        for start in range(0, len(pairs), bs):
            chunk = pairs[start : start + bs]
            queries = [q for q, _ in chunk]
            docs = [d for _, d in chunk]
            ids, attn, types = self.tokenizer.encode_batch(
                queries, self.config.max_seq_len, pairs=docs
            )
            bb = _batch_bucket(len(chunk))
            if bb > len(chunk):
                pad = bb - len(chunk)
                ids = np.pad(ids, ((0, pad), (0, 0)))
                attn = np.pad(attn, ((0, pad), (0, 0)))
                types = np.pad(types, ((0, pad), (0, 0)))
            scores = self._forward(self.params, jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(types))
            pending.append((start, len(chunk), scores))
        out = np.zeros((len(pairs),), np.float32)
        for start, n, scores in pending:
            out[start : start + n] = np.asarray(scores)[:n]
        return out

    def rerank(
        self, query: str, docs: Sequence[str], top_k: Optional[int] = None,
        max_chars: int = 3000,
    ) -> List[Tuple[int, float]]:
        """Score docs against query; returns [(doc_index, score)] sorted desc
        (reference `agents/rerank.py:85-117` truncates doc text first)."""
        pairs = [(query, d[:max_chars]) for d in docs]
        scores = self.score_pairs(pairs)
        order = np.argsort(-scores)
        if top_k is not None:
            order = order[:top_k]
        return [(int(i), float(scores[i])) for i in order]
