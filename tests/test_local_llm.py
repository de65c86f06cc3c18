"""Local in-process generation backend (llm/local_backend.py).

Runs a REAL transformers causal LM — a tiny random-weight GPT-2 with a
from-scratch word-level tokenizer built entirely in-test (zero network) — so
the full chat -> prompt -> generate -> decode -> stream path is executed, not
mocked. Reference parity: LocalHuggingFaceLLMBackend
(`llm/backends/llm_backends.py:157-336`).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from radiant_rag_tpu.config import LLMConfig
from radiant_rag_tpu.llm.backends import LLMError, create_llm_backend
from radiant_rag_tpu.llm.local_backend import (
    LocalTransformersLLMBackend,
    _format_messages,
)


def _tiny_model_and_tokenizer(tmp_path):
    """Tiny GPT-2 (2 layers, 32-dim) + a word-level tokenizer saved to disk,
    reloaded through AutoTokenizer — the same loading path real weights use."""
    from transformers import AutoTokenizer, GPT2Config, GPT2LMHeadModel
    from transformers import PreTrainedTokenizerFast
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ["<unk>", "<eos>", "User", "Assistant", "System", ":", "hello",
             "world", "what", "is", "a", "tpu", "the", "answer", "good"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>",
        pad_token="<eos>")
    fast.save_pretrained(str(tmp_path / "tok"))
    tokenizer = AutoTokenizer.from_pretrained(str(tmp_path / "tok"))

    cfg = GPT2Config(vocab_size=len(vocab), n_positions=64, n_embd=32,
                     n_layer=2, n_head=2, bos_token_id=1, eos_token_id=1)
    torch.manual_seed(0)
    model = GPT2LMHeadModel(cfg).eval()
    return model, tokenizer


@pytest.fixture(scope="module")
def backend(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("llm")
    model, tokenizer = _tiny_model_and_tokenizer(tmp)
    cfg = LLMConfig(backend="local", model_path=str(tmp), device="cpu",
                    temperature=0.0)
    return LocalTransformersLLMBackend(cfg, model=model, tokenizer=tokenizer)


def test_chat_generates_text(backend):
    out = backend.chat([{"role": "user", "content": "what is a tpu"}],
                       temperature=0.0, max_tokens=8)
    assert isinstance(out, str)
    # greedy decode of a real model: non-empty, tokens from the tiny vocab
    assert out.strip()
    for w in out.split():
        assert w in {"User", "Assistant", "System", ":", "hello", "world",
                     "what", "is", "a", "tpu", "the", "answer", "good"}


def test_greedy_is_deterministic(backend):
    msgs = [{"role": "user", "content": "hello world"}]
    a = backend.chat(msgs, temperature=0.0, max_tokens=8)
    b = backend.chat(msgs, temperature=0.0, max_tokens=8)
    assert a == b


def test_stream_matches_chat(backend):
    msgs = [{"role": "user", "content": "the answer is"}]
    full = backend.chat(msgs, temperature=0.0, max_tokens=8)
    chunks = list(backend.chat_stream(msgs, temperature=0.0, max_tokens=8))
    assert len(chunks) >= 1
    assert "".join(chunks).split() == full.split()


def test_prompt_formatting_roles():
    prompt = _format_messages([
        {"role": "system", "content": "be terse"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "again"},
    ])
    assert prompt.startswith("System: be terse")
    assert "User: hi" in prompt and "Assistant: hello" in prompt
    assert prompt.endswith("Assistant:")  # generation cue


def test_factory_dispatch_and_lazy_load(tmp_path):
    cfg = LLMConfig(backend="local", model_path=str(tmp_path / "nope"))
    b = create_llm_backend(cfg)
    assert isinstance(b, LocalTransformersLLMBackend)
    # construction is lazy: no load attempted yet; first chat fails permanent
    with pytest.raises(LLMError) as ei:
        b.chat([{"role": "user", "content": "hi"}])
    assert not ei.value.retryable  # missing weights must not retry-loop


def test_full_model_load_from_disk(tmp_path):
    """End-to-end through AutoModelForCausalLM.from_pretrained on saved
    weights — the exact path a production mounted-weights deployment uses."""
    model, tokenizer = _tiny_model_and_tokenizer(tmp_path)
    model.save_pretrained(str(tmp_path / "model"))
    tokenizer.save_pretrained(str(tmp_path / "model"))
    cfg = LLMConfig(backend="local", model_path=str(tmp_path / "model"),
                    device="cpu")
    b = LocalTransformersLLMBackend(cfg)
    out = b.chat([{"role": "user", "content": "hello"}], temperature=0.0,
                 max_tokens=4)
    assert isinstance(out, str) and out.strip()


def test_transformers_embedding_backend(tmp_path):
    """Local torch-transformers embedding backend against a tiny real BERT
    saved to disk (reference HuggingFaceTransformersEmbeddingBackend,
    embedding_backends.py:372-530)."""
    from transformers import BertConfig as HFBertConfig, BertModel
    from radiant_rag_tpu.llm.model_backends import TransformersEmbeddingBackend

    d = tmp_path / "bert"
    cfg = HFBertConfig(vocab_size=60, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=64)
    torch.manual_seed(0)
    BertModel(cfg).eval().save_pretrained(str(d))
    # word-level tokenizer
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = ["[UNK]", "[PAD]", "hello", "world", "laser", "light", "a", "the"]
    tok = Tokenizer(WordLevel({w: i for i, w in enumerate(words)}, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="[UNK]",
                            pad_token="[PAD]").save_pretrained(str(d))

    be = TransformersEmbeddingBackend(str(d), pooling="mean", batch_size=2)
    embs = be.embed(["hello world", "laser light", "the a hello"])
    assert embs.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-5)
    assert be.embedding_dimension() == 32
    # deterministic + batch-size independent
    one = TransformersEmbeddingBackend(str(d), pooling="mean", batch_size=8)
    np.testing.assert_allclose(one.embed(["hello world", "laser light", "the a hello"]),
                               embs, rtol=1e-5)
    # cls pooling differs from mean pooling
    cls_be = TransformersEmbeddingBackend(str(d), pooling="cls")
    assert not np.allclose(cls_be.embed(["hello world"]), embs[:1])


def test_embedding_backend_factory_transformers(tmp_path):
    from radiant_rag_tpu.config import AppConfig, EmbeddingConfig
    from radiant_rag_tpu.llm.model_backends import (
        TransformersEmbeddingBackend, create_embedding_backend)

    cfg = AppConfig(embedding=EmbeddingConfig(backend="transformers",
                                              weights_path=str(tmp_path)))
    be = create_embedding_backend(cfg)
    assert isinstance(be, TransformersEmbeddingBackend)
    assert be.model_path == str(tmp_path)  # lazy: nothing loaded yet
