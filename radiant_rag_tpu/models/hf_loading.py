"""Optional loading of pretrained HuggingFace BERT weights from local disk.

Zero-egress environment: weights are only loaded if a local checkpoint
directory exists (`embedding.weights_path`). Maps the HF `bert.*` state dict
onto the flax param tree of `models/bert.py`. Without weights the framework
runs with deterministic random init (recall math and benchmarks are unaffected
— both sides of every comparison use the same encoder).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from radiant_rag_tpu.models.bert import BertConfig

logger = logging.getLogger(__name__)


def _load_state_dict(model_dir: str) -> Optional[Dict[str, np.ndarray]]:
    d = Path(model_dir)
    st = d / "model.safetensors"
    if st.is_file():
        try:
            from safetensors.numpy import load_file

            return dict(load_file(str(st)))
        except Exception as exc:  # pragma: no cover
            logger.warning("safetensors load failed: %s", exc)
    pt = d / "pytorch_model.bin"
    if pt.is_file():
        try:
            import torch

            sd = torch.load(str(pt), map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in sd.items()}
        except Exception as exc:  # pragma: no cover
            logger.warning("torch load failed: %s", exc)
    return None


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if any(k.startswith("bert.") for k in sd):
        return {k[len("bert."):] if k.startswith("bert.") else k: v for k, v in sd.items()}
    return sd


def _bert_tree(sd: Dict[str, np.ndarray], cfg: BertConfig) -> Dict[str, Any]:
    """HF bert state dict -> flax param subtree for BertEncoder."""

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32),
        }

    def ln(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32),
        }

    tree: Dict[str, Any] = {
        "word_emb": {"embedding": sd["embeddings.word_embeddings.weight"].astype(np.float32)},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"].astype(np.float32)},
        "type_emb": {"embedding": sd["embeddings.token_type_embeddings.weight"].astype(np.float32)},
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        tree[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
                "out": dense(f"{p}.attention.output.dense"),
            },
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "mlp_in": dense(f"{p}.intermediate.dense"),
            "mlp_out": dense(f"{p}.output.dense"),
            "mlp_ln": ln(f"{p}.output.LayerNorm"),
        }
    return tree


def try_load_bert_params(model_dir: str, cfg: BertConfig) -> Optional[Dict]:
    sd = _load_state_dict(model_dir)
    if sd is None:
        logger.info("no local weights at %s; using deterministic init", model_dir)
        return None
    try:
        sd = _strip_prefix(sd)
        return {"params": _bert_tree(sd, cfg)}
    except KeyError as exc:
        logger.warning("weight mapping failed (missing %s); using init", exc)
        return None


def try_load_cross_encoder_params(model_dir: str, cfg: BertConfig) -> Optional[Dict]:
    sd = _load_state_dict(model_dir)
    if sd is None:
        return None
    try:
        bert_sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}
        tree = {
            "bert": _bert_tree(bert_sd, cfg),
            "pooler": {
                "kernel": bert_sd["pooler.dense.weight"].T.astype(np.float32),
                "bias": bert_sd["pooler.dense.bias"].astype(np.float32),
            },
            "classifier": {
                "kernel": sd["classifier.weight"].T.astype(np.float32),
                "bias": sd["classifier.bias"].astype(np.float32),
            },
        }
        return {"params": tree}
    except KeyError as exc:
        logger.warning("cross-encoder weight mapping failed (missing %s)", exc)
        return None
