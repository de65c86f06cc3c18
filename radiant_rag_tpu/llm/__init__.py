"""LLM chat layer: robust JSON parsing, retrying client, pluggable backends.

Host-side by design — the agent loop is control flow around LLM HTTP calls and
belongs off-device (SURVEY.md §7.1.5). Capability parity with reference
`radiant/llm/client.py` + `radiant/llm/backends/`.
"""

from radiant_rag_tpu.llm.json_parser import JSONParser  # noqa: F401
from radiant_rag_tpu.llm.client import LLMClient  # noqa: F401
from radiant_rag_tpu.llm.backends import (  # noqa: F401
    BaseLLMBackend, OpenAICompatibleLLMBackend, MockLLMBackend, create_llm_backend,
)
