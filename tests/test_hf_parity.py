"""End-to-end pretrained-weight parity (VERDICT r1 missing #2).

Builds a REAL HuggingFace-format checkpoint (random weights, tiny config) with
transformers/torch, loads it through `models/hf_loading.py`, and asserts the
flax forward matches the torch forward numerically. A wrong transpose or
LayerNorm mapping cannot ship silently past these.

Reference behavior target: `llm/local_models.py:61-135` (loads real
MiniLM-L12 / ms-marco cross-encoder checkpoints).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from radiant_rag_tpu.models.bert import BertConfig, BertEncoder
from radiant_rag_tpu.models.hf_loading import (
    try_load_bert_params,
    try_load_cross_encoder_params,
)

TINY = dict(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position=64)


def _hf_config():
    return transformers.BertConfig(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        max_position_embeddings=TINY["max_position"], type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )


def _flax_cfg():
    return BertConfig(vocab_size=TINY["vocab_size"],
                      hidden_size=TINY["hidden_size"],
                      num_layers=TINY["num_layers"],
                      num_heads=TINY["num_heads"],
                      intermediate_size=TINY["intermediate_size"],
                      max_position=TINY["max_position"], dtype=jnp.float32)


def _inputs(rng, b=3, s=10):
    ids = rng.integers(0, TINY["vocab_size"], (b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, 7:] = 0  # ragged padding
    mask[2, 5:] = 0
    types = np.zeros((b, s), np.int32)
    types[:, 6:] = 1
    return ids, mask, types


def _save_checkpoint(model, tmp_path):
    """Prefer the safetensors file our loader reads first; fall back to the
    torch .bin format (also a loader path worth exercising)."""
    sd = model.state_dict()
    try:
        from safetensors.torch import save_file

        save_file({k: v.contiguous() for k, v in sd.items()},
                  str(tmp_path / "model.safetensors"))
        return "safetensors"
    except ImportError:
        torch.save(sd, str(tmp_path / "pytorch_model.bin"))
        return "bin"


def test_bert_forward_parity_vs_torch(tmp_path):
    torch.manual_seed(0)
    hf = transformers.BertModel(_hf_config()).eval()
    fmt = _save_checkpoint(hf, tmp_path)

    cfg = _flax_cfg()
    params = try_load_bert_params(str(tmp_path), cfg)
    assert params is not None, f"loader returned None for {fmt} checkpoint"

    rng = np.random.default_rng(7)
    ids, mask, types = _inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)),
                 token_type_ids=torch.from_numpy(types.astype(np.int64)),
                 ).last_hidden_state.numpy()
    out = np.asarray(BertEncoder(cfg).apply(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)))
    # compare only non-pad positions (pad rows are never consumed downstream:
    # mean_pool masks them; HF fills them via attention to real tokens too,
    # but numerics there are meaningless)
    live = mask.astype(bool)
    np.testing.assert_allclose(out[live], ref[live], atol=2e-4, rtol=1e-3)


def test_bert_forward_parity_torch_bin_format(tmp_path):
    """Same parity through the pytorch_model.bin path with bert.* prefixes
    (BertForSequenceClassification naming)."""
    torch.manual_seed(1)
    cfg_hf = _hf_config()
    cfg_hf.num_labels = 1
    hf_cls = transformers.BertForSequenceClassification(cfg_hf).eval()
    torch.save(hf_cls.state_dict(), str(tmp_path / "pytorch_model.bin"))

    cfg = _flax_cfg()
    params = try_load_bert_params(str(tmp_path), cfg)  # strips bert.*
    assert params is not None
    rng = np.random.default_rng(3)
    ids, mask, types = _inputs(rng)
    with torch.no_grad():
        ref = hf_cls.bert(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            token_type_ids=torch.from_numpy(types.astype(np.int64)),
        ).last_hidden_state.numpy()
    out = np.asarray(BertEncoder(cfg).apply(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)))
    live = mask.astype(bool)
    np.testing.assert_allclose(out[live], ref[live], atol=2e-4, rtol=1e-3)


def test_cross_encoder_logit_parity_vs_torch(tmp_path):
    torch.manual_seed(2)
    cfg_hf = _hf_config()
    cfg_hf.num_labels = 1
    hf = transformers.BertForSequenceClassification(cfg_hf).eval()
    _save_checkpoint(hf, tmp_path)

    cfg = _flax_cfg()
    params = try_load_cross_encoder_params(str(tmp_path), cfg)
    assert params is not None

    from radiant_rag_tpu.models.cross_encoder import CrossEncoderModel

    rng = np.random.default_rng(11)
    ids, mask, types = _inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)),
                 token_type_ids=torch.from_numpy(types.astype(np.int64)),
                 ).logits.numpy()[:, 0]
    out = np.asarray(CrossEncoderModel(cfg).apply(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_missing_keys_fall_back_to_none(tmp_path):
    """A truncated/foreign state dict must not half-load: loader returns None
    (callers then use deterministic init)."""
    from safetensors.numpy import save_file

    save_file({"embeddings.word_embeddings.weight":
               np.zeros((10, 8), np.float32)},
              str(tmp_path / "model.safetensors"))
    assert try_load_bert_params(str(tmp_path), _flax_cfg()) is None
    assert try_load_cross_encoder_params(str(tmp_path), _flax_cfg()) is None
