"""Local in-process generation backend (HF transformers, CPU/accelerator).

Capability parity with the reference's LocalHuggingFaceLLMBackend
(`llm/backends/llm_backends.py:157-336`): run the generator model inside the
process instead of over HTTP. Design differences from the reference:

- Lazy, cached model construction: the app can be configured with
  backend="local" at startup without paying model load until the first chat
  (the reference loads in __init__, stalling app construction).
- True token streaming via transformers' TextIteratorStreamer feeding the
  BaseLLMBackend.chat_stream generator protocol (the reference has no local
  streaming path).
- temperature==0 maps to greedy decoding (do_sample=False), matching the
  deterministic contract the agent JSON prompts rely on.

The retrieval/embedding compute path of this framework is JAX/TPU; generation
is an auxiliary model family the reference serves with torch, so torch is the
right tool here too — it is an optional dependency imported only when this
backend is actually constructed, and any failure surfaces as a permanent
(non-retryable) LLMError so the client's degradation path engages instead of
retry loops.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Dict, List, Optional, Sequence

from radiant_rag_tpu.config import LLMConfig
from radiant_rag_tpu.llm.backends import BaseLLMBackend, LLMError, Message

logger = logging.getLogger(__name__)


def _format_messages(messages: Sequence[Message]) -> str:
    """Role-tagged prompt for tokenizers without a chat template
    (reference `_format_messages_fallback`, `llm_backends.py:320-336`)."""
    parts: List[str] = []
    for m in messages:
        role = m.get("role", "user")
        tag = {"system": "System", "assistant": "Assistant"}.get(role, "User")
        parts.append(f"{tag}: {m.get('content', '')}")
    parts.append("Assistant:")
    return "\n\n".join(parts)


class LocalTransformersLLMBackend(BaseLLMBackend):
    """In-process causal-LM generation over HF transformers.

    `model` may be a local directory or a hub name (hub access requires
    network; this framework's zero-egress deployments point it at mounted
    weights). Pass a pre-built (model, tokenizer) pair to skip loading —
    that is also the unit-test seam.
    """

    def __init__(
        self,
        config: LLMConfig,
        model: Optional[Any] = None,
        tokenizer: Optional[Any] = None,
    ) -> None:
        self.config = config
        self._model = model
        self._tokenizer = tokenizer
        self._load_lock = threading.Lock()

    # -- lazy load ---------------------------------------------------------
    def _ensure_loaded(self) -> None:
        if self._model is not None and self._tokenizer is not None:
            return
        with self._load_lock:
            if self._model is not None and self._tokenizer is not None:
                return
            path = self.config.model_path or self.config.model
            try:
                import torch
                from transformers import AutoModelForCausalLM, AutoTokenizer
            except ImportError as exc:  # pragma: no cover
                raise LLMError(
                    "local backend needs torch+transformers installed", status=400
                ) from exc
            logger.info("loading local generator model from %s", path)
            try:
                tokenizer = AutoTokenizer.from_pretrained(path)
                dtype = torch.float32 if self.config.device == "cpu" else torch.float16
                model = AutoModelForCausalLM.from_pretrained(path, torch_dtype=dtype)
                if self.config.device != "auto":
                    model = model.to(self.config.device)
                model.eval()
            except Exception as exc:
                # model files missing/corrupt: permanent, engage degradation
                raise LLMError(f"failed to load local model {path!r}: {exc}",
                               status=400) from exc
            self._tokenizer = tokenizer
            self._model = model

    # -- prompt ------------------------------------------------------------
    def _build_prompt(self, messages: Sequence[Message]) -> str:
        tok = self._tokenizer
        if getattr(tok, "chat_template", None):
            try:
                return tok.apply_chat_template(
                    list(messages), tokenize=False, add_generation_prompt=True)
            except Exception as exc:
                logger.warning("chat template failed (%s); role-tag fallback", exc)
        return _format_messages(messages)

    def _generate(self, messages: Sequence[Message], temperature: float,
                  max_tokens: int, streamer=None) -> str:
        import torch

        prompt = self._build_prompt(messages)
        inputs = self._tokenizer(prompt, return_tensors="pt")
        inputs = {k: v.to(self._model.device) for k, v in inputs.items()}
        kwargs: Dict[str, Any] = dict(
            max_new_tokens=max_tokens,
            pad_token_id=self._tokenizer.pad_token_id
            if self._tokenizer.pad_token_id is not None
            else self._tokenizer.eos_token_id,
        )
        if temperature and temperature > 0:
            kwargs.update(do_sample=True, temperature=float(temperature))
        else:
            kwargs.update(do_sample=False)
        if streamer is not None:
            kwargs["streamer"] = streamer
        with torch.no_grad():
            out = self._model.generate(**inputs, **kwargs)
        new_tokens = out[0][inputs["input_ids"].shape[1]:]
        return self._tokenizer.decode(new_tokens, skip_special_tokens=True)

    # -- BaseLLMBackend ----------------------------------------------------
    def chat(self, messages: Sequence[Message], temperature: float = 0.2,
             max_tokens: int = 2048) -> str:
        self._ensure_loaded()
        try:
            return self._generate(messages, temperature, max_tokens)
        except LLMError:
            raise
        except Exception as exc:
            raise LLMError(f"local generation failed: {exc}", status=500) from exc

    def chat_stream(self, messages: Sequence[Message], temperature: float = 0.2,
                    max_tokens: int = 2048):
        """True token streaming: generate() runs in a worker thread pushing
        decoded text spans through TextIteratorStreamer; this generator
        yields them as they arrive."""
        self._ensure_loaded()
        try:
            from transformers import TextIteratorStreamer
        except ImportError:  # pragma: no cover - transformers present if loaded
            yield self.chat(messages, temperature=temperature, max_tokens=max_tokens)
            return

        streamer = TextIteratorStreamer(
            self._tokenizer, skip_prompt=True, skip_special_tokens=True)
        errors: List[Exception] = []

        def run() -> None:
            try:
                self._generate(messages, temperature, max_tokens, streamer=streamer)
            except Exception as exc:  # surfaced after the stream drains
                errors.append(exc)
                streamer.end()

        worker = threading.Thread(target=run, daemon=True)
        worker.start()
        for span in streamer:
            if span:
                yield span
        worker.join()
        if errors:
            raise LLMError(f"local streaming generation failed: {errors[0]}",
                           status=500) from errors[0]
