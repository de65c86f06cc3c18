"""Agent layer: the host-side multi-agent query pipeline.

Capability parity with reference `radiant/agents/` (20+ agents,
`agents/__init__.py:22-137`). Agents are control flow around LLM calls and
the device index engine; they stay host-side by design (SURVEY.md §7.1.5).
"""

from radiant_rag_tpu.agents.base import AgentContext, new_agent_context  # noqa: F401
from radiant_rag_tpu.agents.base_agent import (  # noqa: F401
    AgentCategory, AgentMetrics, AgentResult, AgentStatus,
    BaseAgent, LLMAgent, RetrievalAgent,
)
from radiant_rag_tpu.agents.registry import AgentRegistry, get_global_registry, register_agent  # noqa: F401
from radiant_rag_tpu.agents.planning import PlanningAgent  # noqa: F401
from radiant_rag_tpu.agents.query_processing import (  # noqa: F401
    QueryDecompositionAgent, QueryExpansionAgent, QueryRewriteAgent,
)
from radiant_rag_tpu.agents.retrieval import BM25RetrievalAgent, DenseRetrievalAgent  # noqa: F401
from radiant_rag_tpu.agents.fusion import RRFAgent  # noqa: F401
from radiant_rag_tpu.agents.automerge import HierarchicalAutoMergingAgent  # noqa: F401
from radiant_rag_tpu.agents.rerank import CrossEncoderRerankingAgent  # noqa: F401
from radiant_rag_tpu.agents.synthesis import AnswerSynthesisAgent  # noqa: F401
from radiant_rag_tpu.agents.critic import CriticAgent  # noqa: F401
from radiant_rag_tpu.agents.context_eval import ContextEvaluationAgent  # noqa: F401
from radiant_rag_tpu.agents.summarization import SummarizationAgent  # noqa: F401
from radiant_rag_tpu.agents.multihop import MultiHopReasoningAgent  # noqa: F401
from radiant_rag_tpu.agents.fact_verification import FactVerificationAgent  # noqa: F401
from radiant_rag_tpu.agents.citation import CitationTrackingAgent  # noqa: F401
from radiant_rag_tpu.agents.language import LanguageDetectionAgent, TranslationAgent  # noqa: F401
from radiant_rag_tpu.agents.web_search import WebSearchAgent  # noqa: F401
from radiant_rag_tpu.agents.chunking import IntelligentChunkingAgent  # noqa: F401
from radiant_rag_tpu.agents.tools import (  # noqa: F401
    BaseTool, CalculatorTool, ToolRegistry, ToolResult, create_default_tool_registry,
)
from radiant_rag_tpu.agents.strategy_memory import RetrievalStrategyMemory  # noqa: F401
