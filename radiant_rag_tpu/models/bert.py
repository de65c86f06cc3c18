"""BERT-family encoder in flax (MiniLM-class).

The compute core behind both the embedding bi-encoder
(sentence-transformers/all-MiniLM-L12-v2 class: 12 layers, hidden 384,
12 heads — reference `config.py:176-179`) and the cross-encoder reranker
(cross-encoder/ms-marco-MiniLM-L12-v2 — reference `config.py:177`).

TPU-first choices: bfloat16 compute with fp32 LayerNorm/softmax accumulations,
einsum attention that XLA maps onto the MXU, static shapes (padded/bucketed
sequence lengths), no dropout at inference, and a single `apply` usable under
jit/pjit with batch sharded over the mesh data axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16  # compute dtype; params stay fp32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s, h = x.shape
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=name)
        q = dense("query")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = dense("key")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = dense("value")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        # (b, heads, s, s) logits on MXU; softmax in fp32 for stability
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(cfg.head_dim).astype(cfg.dtype)
        logits = logits.astype(jnp.float32)
        neg = jnp.asarray(-1e9, jnp.float32)
        logits = jnp.where(mask[:, None, None, :], logits, neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out")(ctx)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        attn = BertSelfAttention(cfg, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attn_ln")(x + attn)
        x = x.astype(cfg.dtype)
        mlp = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="mlp_in")(x)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_out")(mlp)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="mlp_ln")(x + mlp)
        return x.astype(cfg.dtype)


class BertEncoder(nn.Module):
    """Token ids -> contextual hidden states (b, s, h)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # (b, s) int32
        attention_mask: jax.Array,  # (b, s) bool/int
        token_type_ids: Optional[jax.Array] = None,  # (b, s) int32
    ) -> jax.Array:
        cfg = self.cfg
        b, s = input_ids.shape
        mask = attention_mask.astype(bool)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="word_emb")(input_ids)
        pos_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=cfg.dtype, name="pos_emb")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="type_emb")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="emb_ln")(word + pos + typ)
        x = x.astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, mask)
        return x


def mean_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean pooling over sequence (sentence-transformers default)."""
    m = attention_mask.astype(jnp.float32)[:, :, None]
    summed = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return summed / counts


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def init_params(cfg: BertConfig, seq_len: int = 16, seed: int = 0) -> Dict:
    """Deterministic parameter init (used when no pretrained weights exist)."""
    model = BertEncoder(cfg)
    rng = jax.random.PRNGKey(seed)
    dummy_ids = jnp.zeros((1, seq_len), jnp.int32)
    dummy_mask = jnp.ones((1, seq_len), jnp.int32)
    return model.init(rng, dummy_ids, dummy_mask)
