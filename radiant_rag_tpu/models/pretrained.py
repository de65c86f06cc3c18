"""Shipped pretrained weights: the out-of-the-box dense leg + reranker.

The reference deploys with working MiniLM / ms-marco weights by default
(`/root/reference/radiant/llm/local_models.py:61-135`); this framework owns
its models, so it ships the checkpoints its own training recipe produced on
the 100k real-text corpus (tools/bench_quality_scale.py): a dim-128/6-layer
bi-encoder and a dim-128/6-layer cross-encoder, as params-only npz
artifacts under `radiant_rag_tpu/data/` (float32, ~7 MB each — orbax
TrainStates carry optimizer state and belong in data_dir, not the package).

Resolution order stays: explicit checkpoint_dir > weights_path (HF) >
shipped artifact (shape-matched) > random init. A deployment that trains
its own encoder (`train --auto`) naturally overrides these via its
checkpoint_dir.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

PRETRAINED_DIR = Path(__file__).resolve().parent.parent / "data"


def _path_key(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "name", p))))
    return "/".join(parts)


def save_params_npz(params: Any, path: str) -> None:
    """Flatten a param tree to an npz keyed by '/'-joined tree paths."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {_path_key(p): np.asarray(v) for p, v in flat}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_params_npz(path: str, template: Any) -> Optional[Any]:
    """Rebuild a param tree shaped like `template` from an npz; None when
    the file is absent or any leaf is missing/shape-mismatched."""
    p = Path(path)
    if not p.is_file():
        return None
    try:
        with np.load(p) as z:
            stored = {k: z[k] for k in z.files}
    except Exception as exc:
        logger.warning("pretrained artifact %s unreadable (%s)", path, exc)
        return None
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for tree_path, leaf in flat:
        key = _path_key(tree_path)
        arr = stored.get(key)
        if arr is None or tuple(arr.shape) != tuple(np.shape(leaf)):
            logger.info(
                "pretrained artifact %s does not match the configured "
                "architecture (leaf %s); ignoring", path, key)
            return None
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)


def _artifact(name: str, cfg) -> str:
    return str(PRETRAINED_DIR
               / f"{name}_{cfg.hidden_size}x{cfg.num_layers}.npz")


def shipped_embedder_params(bert_cfg, template: Any) -> Optional[Any]:
    """The trained bi-encoder artifact for this architecture, or None."""
    out = load_params_npz(_artifact("embedder", bert_cfg), template)
    if out is not None:
        logger.info("embedder: using shipped pretrained weights (%s)",
                    _artifact("embedder", bert_cfg))
    return out


def shipped_cross_encoder_params(bert_cfg, template: Any) -> Optional[Any]:
    """The trained cross-encoder artifact for this architecture, or None."""
    out = load_params_npz(_artifact("cross_encoder", bert_cfg), template)
    if out is not None:
        logger.info("cross-encoder: using shipped pretrained weights (%s)",
                    _artifact("cross_encoder", bert_cfg))
    return out
