"""Config system tests (reference test analog: `tests/test_all.py:24-173`)."""

import os

import pytest

from radiant_rag_tpu.config import AppConfig, load_config, config_to_dict


def test_defaults():
    cfg = load_config(path="/nonexistent/nope.yaml")
    # weightless jax deployments resolve preset=auto -> trainable-small:
    # the dim-128/6-layer architecture `train --auto` is built for (and the
    # shipped data/embedder_ckpt matches); index dim follows embedding dim
    assert cfg.embedding.dim == 128 and cfg.embedding.num_layers == 6
    assert cfg.index.dim == 128
    assert cfg.retrieval.rrf_k == 60
    assert cfg.bm25.k1 == 1.5
    assert cfg.quantization.precision == "both"
    assert cfg.rerank.candidate_multiplier == 4


def test_embedding_preset_resolution(tmp_path, monkeypatch):
    # explicit fields beat the preset; index.dim follows unless pinned
    p = tmp_path / "c.yaml"
    p.write_text("embedding:\n  dim: 384\n")
    cfg = load_config(path=str(p))
    assert cfg.embedding.dim == 384 and cfg.index.dim == 384
    assert cfg.embedding.num_layers == 6  # non-pinned preset field applies
    # preset: none leaves the dataclass defaults untouched
    p.write_text("embedding:\n  preset: none\n")
    cfg = load_config(path=str(p))
    assert cfg.embedding.dim == 384 and cfg.embedding.num_layers == 12
    # a weights_path makes preset=auto resolve to none (pretrained deploy)
    p.write_text("embedding:\n  weights_path: /models/minilm\n")
    cfg = load_config(path=str(p))
    assert cfg.embedding.dim == 384 and cfg.embedding.num_layers == 12
    # direct dataclass construction is never rewritten
    assert AppConfig().embedding.dim == 384


def test_yaml_override(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("retrieval:\n  dense_top_k: 25\nbm25:\n  k1: 2.0\n")
    cfg = load_config(path=str(p))
    assert cfg.retrieval.dense_top_k == 25
    assert cfg.bm25.k1 == 2.0
    assert cfg.retrieval.rrf_k == 60  # untouched default


def test_env_override(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("retrieval:\n  dense_top_k: 25\n")
    monkeypatch.setenv("RADIANT_RETRIEVAL_DENSE_TOP_K", "7")
    monkeypatch.setenv("RADIANT_PIPELINE_USE_CRITIC", "false")
    cfg = load_config(path=str(p))
    assert cfg.retrieval.dense_top_k == 7  # env > file
    assert cfg.pipeline.use_critic is False


def test_tuple_coercion(monkeypatch):
    monkeypatch.setenv("RADIANT_WEB_SEARCH_BLOCKED_DOMAINS", "a.com, b.com")
    cfg = load_config(path="/nonexistent/nope.yaml")
    assert cfg.web_search.blocked_domains == ("a.com", "b.com")


def test_secret_redaction():
    cfg = AppConfig()
    d = config_to_dict(cfg.__class__(llm=cfg.llm.__class__(api_key="sk-secret")))
    assert d["llm"]["api_key"] == "***"


def test_quantization_validation():
    from radiant_rag_tpu.config import QuantizationConfig

    with pytest.raises(ValueError):
        QuantizationConfig(precision="bogus").validate()
    with pytest.raises(ValueError):
        QuantizationConfig(rescore_multiplier=0.5).validate()
