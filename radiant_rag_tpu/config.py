"""Configuration system: YAML -> frozen dataclasses with env-var overrides.

Capability parity with reference `radiant/config.py` (36 frozen dataclasses
aggregated into `AppConfig`, `config.py:941-979`; env override scheme
`RADIANT_<SECTION>_<KEY>`, `config.py:32-130`; precedence env > file > defaults,
`config.py:1010-1027`) — redesigned generically: sections are registered
dataclasses and one loader walks fields for YAML merge + env coercion instead
of 36 hand-written parsers.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import re
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Type, get_args, get_origin

logger = logging.getLogger(__name__)

ENV_PREFIX = "RADIANT"

# ---------------------------------------------------------------------------
# Section dataclasses
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class IndexConfig:
    """Device-resident vector index (replaces reference storage backends +
    HNSW params, `config.py:266-272`)."""

    backend: str = "tpu"  # tpu | numpy  (numpy = host dev/test parity backend)
    dim: int = 384
    metric: str = "cosine"  # cosine | dot
    dtype: str = "float32"  # storage dtype of full-precision vectors
    initial_capacity: int = 4096
    growth_factor: float = 2.0
    # graph (HNSW-equivalent) parameters, reference config.py:266-272
    graph_degree: int = 16  # M
    graph_ef_construction: int = 200
    graph_ef_runtime: int = 100
    use_graph: bool = False  # flat/quantized scan is default engine
    # memory-tier mode: drop fp32 vectors from HBM, rescore via int8 dequant
    # (doubles per-chip corpus capacity; exact mode unavailable)
    store_fp32: bool = True
    # Pallas fused scan->top-K stage 1 (no (B, N) score materialization);
    # falls back to the XLA scan when capacity is not tile-aligned
    use_pallas_scan: bool = False
    # stage-1 candidate selection policy: "" = process default (f32, the
    # measured fastest; RAD_STAGE1_SELECT overrides) | f32 | bf16 (halves
    # the (B, N) score buffer, for HBM-capacity-bound corpora) |
    # bf16_chunked (bounded transient footprint, compile independent of N)
    stage1_select: str = ""
    data_dir: str = "./data/index"
    # durability (the reference gets this implicitly from Redis): load any
    # saved index from data_dir at startup and save after each ingest
    auto_persist: bool = True
    # document-content storage: "memory" holds every chunk's text in host
    # RAM (fine to ~1M chunks); "spill" keeps content on disk with an
    # id->(segment,offset) index + LRU in RAM — the 10M-corpus path
    # (reference leans on Redis for this, `redis_store.py:414-424`)
    docstore: str = "memory"  # memory | spill
    docstore_cache_docs: int = 50_000  # spill-mode LRU size (docs)


@dataclass(frozen=True)
class QuantizationConfig:
    """Binary/int8 quantization (reference `storage/quantization.py:33-71`)."""

    enabled: bool = True
    precision: str = "both"  # binary | int8 | both
    rescore_multiplier: float = 4.0
    use_rescoring: bool = True
    int8_ranges_path: str = ""  # optional .npy calibration artifact
    int8_on_disk_only: bool = False

    def validate(self) -> None:
        if self.precision not in ("binary", "int8", "both"):
            raise ValueError(f"invalid quantization precision: {self.precision}")
        if self.rescore_multiplier < 1.0:
            raise ValueError("rescore_multiplier must be >= 1.0")


@dataclass(frozen=True)
class BM25Config:
    """BM25 parameters (reference `config.py:394-395`, `bm25_index.py:62`)."""

    k1: float = 1.5
    b: float = 0.75
    index_path: str = "./data/bm25_index.json.gz"
    auto_save_threshold: int = 100
    max_query_terms: int = 32
    max_postings_per_query: int = 1 << 18
    # impact-sketch stage-1 (hashed BM25-as-matmul); 0 disables
    sketch_dim: int = 1024
    # HBM ceiling for the (N, sketch_dim) int8 sketch; at 10M docs the
    # default S=1024 would need 10.2 GB, so the index auto-halves S to fit
    # (exact pages routing covers rare-term queries regardless)
    sketch_hbm_budget_gb: float = 3.0
    # auto-router: a query containing a term with df <= this fraction of
    # live docs takes the exact pages path even at high posting volume
    # (the sketch measurably fails "discriminative term at volume" traffic
    # at the 1M scale — BENCH_NOTES router study)
    disc_route_df_frac: float = 0.01
    # auto-router COST GATE (round-5 chip study, BENCH_NOTES "pages cost
    # at 1M"): the pages program's cost is ~linear in the page count and
    # its (B, N) f32 scatter buffer OOMs outright at b=2048 x 1M, so a
    # qualifying batch only takes pages when its estimated page count and
    # score-matrix cells stay under these caps (4096 pages ~= 1.1 s/batch
    # worst-case measured; 2^30 cells = a 4 GB score buffer). Oversized
    # qualifying batches fall back to the sketch + exact rescore.
    pages_route_max_pages: int = 4096
    pages_route_max_cells: int = 1 << 30
    # above this many docs, skip JSON persistence and rebuild from the store
    # on load instead (the native bulk build is faster than parsing the file)
    persist_max_docs: int = 200000
    auto_build: bool = True  # build from store on first use when file absent


@dataclass(frozen=True)
class RetrievalConfig:
    """Retrieval defaults (reference `config.py:419-431`)."""

    dense_top_k: int = 10
    bm25_top_k: int = 10
    fused_top_k: int = 15
    rrf_k: int = 60
    min_similarity: float = 0.0
    search_scope: str = "leaves"  # leaves | parents | all
    retrieval_mode: str = "hybrid"  # hybrid | dense | bm25
    # "auto": the calibration probe pass picks the best-measured fusion
    # config for THIS corpus (calibrated-weight RRF vs z-score interpolation
    # over a weight grid; `index/hybrid.py:calibrate_fusion`).
    # "confidence": calibration-weighted RRF (an unreliable leg is demoted to
    # a tiebreaker — keeps hybrid MRR at or above the better single leg).
    # "score": z-normalized score interpolation. "equal": reference parity
    # (`agents/fusion.py:79-102`).
    fusion_weighting: str = "auto"
    # Candidate-pool deepening: both legs are retrieved and fused at this
    # depth, then the fused list is truncated to fused_top_k (on device).
    # -1 = auto (4 x fused_top_k, the reference's rerank candidate ratio,
    # `agents/rerank.py:85-117`); 0 = off. Measured at 100k real-text docs:
    # depth 32 vs 10 = +0.047 MRR / +0.05 hit@10 at ~no QPS cost
    # (BENCH_NOTES round 4 rerank decomposition).
    fused_depth: int = -1
    # fusion-calibration probe budget and style mix (`calibrate_fusion`):
    # probes are ICT spans + synonym paraphrases, split select/confirm for
    # unbiased config selection. calibration_seeds > 1 re-draws probes and
    # requires the selected config to agree across seeds (probe count
    # auto-doubles when it doesn't).
    calibration_probes: int = 128
    calibration_paraphrase_fraction: float = 0.5
    calibration_seeds: int = 2


@dataclass(frozen=True)
class RerankConfig:
    """Cross-encoder rerank (reference `config.py:434-440`)."""

    enabled: bool = True
    top_k: int = 8
    candidate_multiplier: int = 4
    min_candidates: int = 16
    max_chars: int = 3000
    # Retrieval-prior blend: final order = z(CE score) + prior_weight *
    # z(incoming retrieval score). 0 = pure CE order (reference behavior —
    # safe only with strong pretrained CE weights); large values degenerate
    # to the incoming order, so the stage cannot lose to the ordering it
    # consumes. Measured on 100k real text with a from-scratch CE: pure CE
    # order 0.54 MRR vs incoming 0.82; w=1.0 blend 0.85 (BENCH_NOTES r4).
    prior_weight: float = 1.0
    # Measured auto-disable: after fusion calibration, self-retrieval probes
    # price the CE blend against the incoming fused order on the LIVE
    # corpus; if the stage adds < auto_disable_min_gain MRR it is switched
    # off for the session (the CE costs ~10x serving QPS when on — round-4:
    # 1,262 vs ~16k QPS at 1M — and a CE that cannot beat its own input by
    # the margin is a passenger). 0 probes disables the check.
    auto_disable_probes: int = 64
    auto_disable_min_gain: float = 0.005


@dataclass(frozen=True)
class EmbeddingConfig:
    """Embedding model (reference `config.py:176-179`)."""

    backend: str = "jax"  # jax | openai_compatible
    model_name: str = "minilm-l12"
    weights_path: str = ""  # local flax/HF weights; empty => deterministic init
    # Architecture preset (resolved by load_config, never by this class —
    # explicitly-set YAML/env fields always win over the preset):
    #   "auto" (default): weightless jax deployments (no weights_path) get
    #     "trainable-small"; anything else resolves to "none".
    #   "trainable-small": the measured capacity recipe for training an
    #     encoder from scratch on the indexed corpus (dim 128 / 6 layers —
    #     the config `train --auto` is built for; dim-64-class encoders
    #     measurably cannot learn real-text paraphrase, BENCH_NOTES r3).
    #     Matches the checkpoint shipped in data/embedder_ckpt, so a fresh
    #     deploy starts from trained real-text weights instead of random
    #     init (reference ships MiniLM weights: `llm/local_models.py:61-135`).
    #   "none": use the explicit fields below as-is.
    preset: str = "auto"
    dim: int = 384
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 1536
    vocab_size: int = 30522
    max_seq_len: int = 256
    # chip-measured embed throughput sweep (BENCH_NOTES round 3): 128 ->
    # 2830 chunks/s, 512 -> 7905, 1024 -> 11458 (peak; 2048 regresses).
    # The per-dispatch fixed cost dominates small batches.
    batch_size: int = 1024
    normalize: bool = True
    cache_size: int = 10000
    dtype: str = "bfloat16"
    # orbax dir the `train` CLI writes; a fresh process restores the latest
    # trained params from here (precedence: explicit params > this
    # checkpoint > weights_path HF load > deterministic init)
    checkpoint_dir: str = "./data/embedder_ckpt"


@dataclass(frozen=True)
class CrossEncoderConfig:
    """Cross-encoder model (reference `config.py:177`)."""

    backend: str = "jax"  # jax | llm
    model_name: str = "minilm-l12-cross"
    weights_path: str = ""
    max_seq_len: int = 384
    batch_size: int = 32
    dtype: str = "bfloat16"
    # architecture (MiniLM-L12 class by default; weightless deploys resolve
    # to the trainable-small shape so the shipped trained reranker artifact
    # matches — `_apply_embedding_preset`)
    dim: int = 384
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 1536
    vocab_size: int = 30522


@dataclass(frozen=True)
class LLMConfig:
    """LLM chat backend (reference `llm/client.py`, `llm_backends.py:27`)."""

    backend: str = "openai_compatible"  # openai_compatible | local | mock
    base_url: str = "http://localhost:11434/v1"
    api_key: str = "unused"
    model: str = "llama3.1"
    # backend="local": in-process transformers generation (reference
    # LocalHuggingFaceLLMBackend, llm_backends.py:157). model_path is a local
    # weights dir (falls back to `model` as a hub name when empty).
    model_path: str = ""
    device: str = "cpu"  # cpu | auto | cuda | ...
    temperature: float = 0.2
    max_tokens: int = 2048
    timeout_s: float = 120.0
    max_retries: int = 3
    retry_backoff_s: float = 1.0


@dataclass(frozen=True)
class PipelineConfig:
    """Static pipeline feature flags (reference `config.py:828-838`)."""

    use_planning: bool = True
    use_decomposition: bool = True
    use_rewrite: bool = True
    use_expansion: bool = True
    use_rrf: bool = True
    use_automerge: bool = True
    use_rerank: bool = True
    use_critic: bool = True
    use_web_search: bool = False
    use_multihop: bool = True
    use_context_eval: bool = True
    use_summarization: bool = True
    use_fact_verification: bool = True
    use_citation: bool = True
    use_tools: bool = True


@dataclass(frozen=True)
class AgenticConfig:
    """Critic retry loop (reference orchestrator phases)."""

    max_critic_retries: int = 2
    confidence_threshold: float = 0.5
    give_up_confidence: float = 0.2
    simple_query_max_words: int = 10


@dataclass(frozen=True)
class QueryConfig:
    """Query processing limits (reference `config.py` query section)."""

    max_decomposed_queries: int = 3
    max_expansions: int = 2
    max_rewrites: int = 3


@dataclass(frozen=True)
class SynthesisConfig:
    """Answer synthesis (reference `config.py:453-454`)."""

    max_context_docs: int = 8
    max_chars_per_doc: int = 4000
    include_conversation_history: bool = True


@dataclass(frozen=True)
class CriticConfig:
    max_chars_per_doc: int = 1200
    max_docs: int = 6


@dataclass(frozen=True)
class ContextEvalConfig:
    enabled: bool = True
    use_llm: bool = False  # heuristic by default; LLM opt-in
    min_mean_score: float = 0.25
    min_docs: int = 1


@dataclass(frozen=True)
class SummarizationConfig:
    """Context compression (reference `agents/summarization.py`)."""

    max_total_context_chars: int = 8000
    max_doc_chars: int = 3000
    dedup_similarity: float = 0.85
    keep_recent_turns: int = 4


@dataclass(frozen=True)
class MultiHopConfig:
    enabled: bool = True
    max_hops: int = 3
    docs_per_hop: int = 4
    min_hop_confidence: float = 0.3


@dataclass(frozen=True)
class FactVerificationConfig:
    enabled: bool = True
    max_claims: int = 10
    correct_answer: bool = True
    min_overall_score: float = 0.5


@dataclass(frozen=True)
class CitationConfig:
    enabled: bool = True
    style: str = "inline"  # inline | footnote | academic | hyperlink | enterprise
    min_confidence: float = 0.3
    include_bibliography: bool = True


@dataclass(frozen=True)
class LanguageConfig:
    """Language detection + translation (reference `agents/language_detection.py`,
    `agents/translation.py`)."""

    enabled: bool = False
    canonical_language: str = "en"
    min_confidence: float = 0.5
    max_chars_per_llm_call: int = 4000


@dataclass(frozen=True)
class IngestionConfig:
    """Chunking/ingest (reference `config.py:399-416`)."""

    child_chunk_size: int = 512
    chunk_overlap: int = 50
    max_parent_chars: int = 50000
    embed_batch_size: int = 32
    # >= embedding.batch_size so each ingest embed call can fill the
    # embedder's optimal device batch
    upsert_batch_size: int = 2048
    hierarchical: bool = True
    use_intelligent_chunking: bool = False
    translate_at_ingestion: bool = False
    # PDF partition strategy (reference `ingestion/processor.py:236-273`):
    # fast = text-layer extraction only; auto = text layer, falling back to
    # unstructured/OCR per file when pages have no extractable text (scans);
    # hi_res / ocr_only = force the corresponding unstructured strategy
    # (degrades to fast with a warning when unstructured isn't installed)
    pdf_strategy: str = "auto"  # auto | fast | hi_res | ocr_only


@dataclass(frozen=True)
class AutoMergeConfig:
    """Hierarchical auto-merge (reference `agents/automerge.py:85-137`)."""

    enabled: bool = True
    min_children_to_merge: int = 2
    max_parent_chars: int = 50000


@dataclass(frozen=True)
class WebSearchConfig:
    enabled: bool = False
    max_urls: int = 3
    cache_ttl_s: float = 3600.0
    blocked_domains: Tuple[str, ...] = ()
    trigger_keywords: Tuple[str, ...] = ("latest", "news", "today", "current", "recent")


@dataclass(frozen=True)
class WebCrawlerConfig:
    max_depth: int = 2
    max_pages: int = 50
    same_domain_only: bool = True
    rate_limit_delay_s: float = 0.5
    timeout_s: float = 20.0
    include_patterns: Tuple[str, ...] = ()
    exclude_patterns: Tuple[str, ...] = ()


@dataclass(frozen=True)
class GitHubConfig:
    token: str = ""
    max_files: int = 200
    include_extensions: Tuple[str, ...] = (".md", ".py", ".txt", ".rst")


@dataclass(frozen=True)
class CacheConfig:
    """LRU caches (reference `utils/cache.py`)."""

    embedding_cache_size: int = 10000
    query_cache_size: int = 1000
    query_cache_ttl_s: float = 3600.0


@dataclass(frozen=True)
class ConversationConfig:
    enabled: bool = True
    max_turns: int = 20
    ttl_s: float = 86400.0
    data_dir: str = "./data/conversations"


@dataclass(frozen=True)
class MetricsConfig:
    prometheus_enabled: bool = False
    prometheus_port: int = 9090
    otel_enabled: bool = False
    otel_endpoint: str = ""


@dataclass(frozen=True)
class LoggingConfig:
    level: str = "INFO"
    file: str = ""
    color: bool = True


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / sharding — the component the reference lacks entirely
    (SURVEY.md §2.8, §5.8). Axis sizes of -1 mean "all remaining devices"."""

    # -1 = all remaining devices: `index.backend: sharded` shards the corpus
    # over every chip in the slice out of the box (factory.create_vector_store)
    data_axis: int = -1
    model_axis: int = 1
    shard_corpus: bool = False  # shard index rows across data axis
    dtype_compute: str = "bfloat16"


@dataclass(frozen=True)
class StrategyMemoryConfig:
    enabled: bool = True
    path: str = "./data/strategy_memory.json.gz"
    decay: float = 0.95
    min_confidence: float = 0.6


@dataclass(frozen=True)
class ToolsConfig:
    enabled: bool = True
    allow_code_execution: bool = False


@dataclass(frozen=True)
class ReportConfig:
    default_format: str = "markdown"
    include_metrics: bool = True


@dataclass(frozen=True)
class ServerConfig:
    """HTTP serving (no reference analog — the reference is CLI/TUI-only).

    Coalescing: concurrent /search requests arriving within `max_wait_ms` of
    each other are merged into ONE batched device program (the engine is
    batched-first), multiplying serving throughput under load."""

    host: str = "0.0.0.0"
    port: int = 8080
    coalesce: bool = True
    # Peak queries folded into one device batch. Only reached under heavy
    # concurrency (a batch dispatches as soon as max_wait_ms passes), so a
    # large cap costs idle deployments nothing while lifting the loaded
    # ceiling: pipeline_depth x max_batch / batch_time. 256 is chip-measured
    # at 56-62 ms/batch for 100k-1M docs (bench_batch_sweep) — ~8-9k QPS
    # ceiling vs ~1.4k at the old cap of 32. The engine's HBM gate still
    # bounds the actual bucket; `serve --warmup` precompiles up to this.
    max_batch: int = 256
    max_wait_ms: float = 4.0
    # batches kept in flight by the coalescer worker (device->host fetch of
    # one batch overlaps the next batch's dispatch); 1 = sequential
    pipeline_depth: int = 2
    # Concurrent requests allowed inside the HTTP host-path CPU sections
    # (read + JSON parse, JSON serialize + socket write). The server is
    # thread-per-connection; under heavy client oversubscription on a
    # small host the GIL time-slices every live request's CPU section and
    # the p99 explodes (round-4: 3.28 s at 64 clients on one core). The
    # gate serializes those sections down to `request_workers` at a time
    # (waiters queue FIFO on the semaphore) WITHOUT capping coalescer
    # batch formation — waiting inside the coalescer holds no gate slot.
    # 0 disables the gate.
    request_workers: int = 8


# ---------------------------------------------------------------------------
# Aggregate
# ---------------------------------------------------------------------------

_SECTIONS: Dict[str, Type] = {
    "index": IndexConfig,
    "quantization": QuantizationConfig,
    "bm25": BM25Config,
    "retrieval": RetrievalConfig,
    "rerank": RerankConfig,
    "embedding": EmbeddingConfig,
    "cross_encoder": CrossEncoderConfig,
    "llm": LLMConfig,
    "pipeline": PipelineConfig,
    "agentic": AgenticConfig,
    "query": QueryConfig,
    "synthesis": SynthesisConfig,
    "critic": CriticConfig,
    "context_eval": ContextEvalConfig,
    "summarization": SummarizationConfig,
    "multihop": MultiHopConfig,
    "fact_verification": FactVerificationConfig,
    "citation": CitationConfig,
    "language": LanguageConfig,
    "ingestion": IngestionConfig,
    "automerge": AutoMergeConfig,
    "web_search": WebSearchConfig,
    "web_crawler": WebCrawlerConfig,
    "github": GitHubConfig,
    "cache": CacheConfig,
    "conversation": ConversationConfig,
    "metrics": MetricsConfig,
    "logging": LoggingConfig,
    "mesh": MeshConfig,
    "strategy_memory": StrategyMemoryConfig,
    "tools": ToolsConfig,
    "report": ReportConfig,
    "server": ServerConfig,
}


@dataclass(frozen=True)
class AppConfig:
    """Aggregate of all sections (reference `config.py:941-979`)."""

    index: IndexConfig = field(default_factory=IndexConfig)
    quantization: QuantizationConfig = field(default_factory=QuantizationConfig)
    bm25: BM25Config = field(default_factory=BM25Config)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    rerank: RerankConfig = field(default_factory=RerankConfig)
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)
    cross_encoder: CrossEncoderConfig = field(default_factory=CrossEncoderConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    agentic: AgenticConfig = field(default_factory=AgenticConfig)
    query: QueryConfig = field(default_factory=QueryConfig)
    synthesis: SynthesisConfig = field(default_factory=SynthesisConfig)
    critic: CriticConfig = field(default_factory=CriticConfig)
    context_eval: ContextEvalConfig = field(default_factory=ContextEvalConfig)
    summarization: SummarizationConfig = field(default_factory=SummarizationConfig)
    multihop: MultiHopConfig = field(default_factory=MultiHopConfig)
    fact_verification: FactVerificationConfig = field(default_factory=FactVerificationConfig)
    citation: CitationConfig = field(default_factory=CitationConfig)
    language: LanguageConfig = field(default_factory=LanguageConfig)
    ingestion: IngestionConfig = field(default_factory=IngestionConfig)
    automerge: AutoMergeConfig = field(default_factory=AutoMergeConfig)
    web_search: WebSearchConfig = field(default_factory=WebSearchConfig)
    web_crawler: WebCrawlerConfig = field(default_factory=WebCrawlerConfig)
    github: GitHubConfig = field(default_factory=GitHubConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    conversation: ConversationConfig = field(default_factory=ConversationConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    strategy_memory: StrategyMemoryConfig = field(default_factory=StrategyMemoryConfig)
    tools: ToolsConfig = field(default_factory=ToolsConfig)
    report: ReportConfig = field(default_factory=ReportConfig)
    server: ServerConfig = field(default_factory=ServerConfig)


# ---------------------------------------------------------------------------
# Loading: defaults <- YAML <- env
# ---------------------------------------------------------------------------

_SECRET_FIELD_RE = re.compile(r"(api_key|token|password|secret)", re.I)


def _coerce(value: Any, ftype: Any) -> Any:
    """Coerce a YAML/env value to a dataclass field type."""
    origin = get_origin(ftype)
    if origin in (tuple, Tuple):
        if isinstance(value, str):
            value = [v.strip() for v in value.split(",") if v.strip()]
        args = get_args(ftype)
        elem = args[0] if args and args[0] is not Ellipsis else str
        return tuple(_coerce(v, elem) for v in value)
    if origin in (list, List):
        if isinstance(value, str):
            value = [v.strip() for v in value.split(",") if v.strip()]
        args = get_args(ftype)
        elem = args[0] if args else str
        return [_coerce(v, elem) for v in value]
    if ftype is bool:
        if isinstance(value, bool):
            return value
        return str(value).strip().lower() in ("1", "true", "yes", "on")
    if ftype is int:
        return int(value)
    if ftype is float:
        return float(value)
    if ftype is str:
        return str(value)
    if ftype is Any or isinstance(value, dict):
        return value
    return value


def _build_section(cls: Type, data: Dict[str, Any], env_path: str) -> Any:
    """Construct a section dataclass from YAML `data` + env overrides.

    Env scheme (reference `config.py:32-35`): RADIANT_<SECTION>_<KEY>, upper-cased.
    """
    kwargs: Dict[str, Any] = {}
    for f in fields(cls):
        env_key = f"{ENV_PREFIX}_{env_path}_{f.name}".upper()
        if env_key in os.environ:
            kwargs[f.name] = _coerce(os.environ[env_key], f.type_resolved if hasattr(f, "type_resolved") else _resolve_type(cls, f))
        elif f.name in data:
            kwargs[f.name] = _coerce(data[f.name], _resolve_type(cls, f))
    unknown = set(data) - {f.name for f in fields(cls)}
    if unknown:
        logger.warning("config section %s: unknown keys ignored: %s", env_path, sorted(unknown))
    return cls(**kwargs)


def _resolve_type(cls: Type, f: dataclasses.Field) -> Any:
    """Resolve possibly-stringified annotations (PEP 563)."""
    t = f.type
    if isinstance(t, str):
        import typing

        try:
            t = eval(t, {**vars(typing), **globals()}, {})  # noqa: S307 - trusted module scope
        except Exception:
            t = str
    return t


_DEFAULT_SEARCH_PATH = (
    "./radiant_tpu.yaml",
    "./config.yaml",
    "~/.config/radiant_tpu/config.yaml",
)


def load_config(path: Optional[str] = None) -> AppConfig:
    """Load configuration with precedence env > YAML file > defaults
    (reference `config.py:1010-1027`; search path `config.py:22-29`)."""
    data: Dict[str, Any] = {}
    candidates = [path] if path else [os.environ.get(f"{ENV_PREFIX}_CONFIG")] + list(_DEFAULT_SEARCH_PATH)
    for cand in candidates:
        if not cand:
            continue
        p = Path(cand).expanduser()
        if p.is_file():
            try:
                import yaml

                with open(p) as fh:
                    data = yaml.safe_load(fh) or {}
                logger.info("loaded config from %s", p)
            except Exception as exc:  # pragma: no cover - defensive
                logger.warning("failed to load config %s: %s", p, exc)
            break

    sections = {}
    for name, cls in _SECTIONS.items():
        sections[name] = _build_section(cls, data.get(name, {}) or {}, name)
    _apply_embedding_preset(sections, data)
    cfg = AppConfig(**sections)
    cfg.quantization.validate()
    return cfg


# the measured capacity recipe for from-scratch corpus training: dim-64-class
# encoders cannot learn real-text paraphrase (0.093 MRR); dim-128/6-layer
# reaches a contributing dense leg (BENCH_NOTES round 3 capacity study)
_TRAINABLE_SMALL = {
    "dim": 128, "num_layers": 6, "num_heads": 4, "hidden_dim": 256,
    "vocab_size": 8192, "max_seq_len": 64,
}

_TRAINABLE_SMALL_CE = {
    "dim": 128, "num_layers": 6, "num_heads": 4, "hidden_dim": 256,
    "vocab_size": 8192, "max_seq_len": 128,
}


def _explicit_keys(section: str, data: Dict[str, Any]) -> set:
    """Field names the user pinned for `section` via YAML or env."""
    keys = set((data.get(section) or {}).keys())
    prefix = f"{ENV_PREFIX}_{section}_".upper()
    for k in os.environ:
        if k.startswith(prefix):
            keys.add(k[len(prefix):].lower())
    return keys


def _apply_embedding_preset(sections: Dict[str, Any], data: Dict[str, Any]) -> None:
    """Resolve embedding.preset into concrete architecture fields.

    Only load_config applies presets — direct dataclass construction (tests,
    embedded use) is never rewritten. Explicit YAML/env fields win over the
    preset; index.dim follows embedding.dim unless the user pinned it."""
    emb = sections["embedding"]
    preset = getattr(emb, "preset", "none")
    if preset == "auto":
        preset = ("trainable-small"
                  if emb.backend == "jax" and not emb.weights_path else "none")
    if preset in ("none", ""):
        return
    if preset != "trainable-small":
        logger.warning("unknown embedding.preset %r ignored", preset)
        return
    explicit = _explicit_keys("embedding", data)
    overrides = {k: v for k, v in _TRAINABLE_SMALL.items() if k not in explicit}
    if overrides:
        sections["embedding"] = dataclasses.replace(emb, **overrides)
    if "dim" not in _explicit_keys("index", data):
        sections["index"] = dataclasses.replace(
            sections["index"], dim=sections["embedding"].dim)
    # weightless deploys also size the cross-encoder to the trainable-small
    # shape so the shipped trained reranker artifact matches
    ce = sections["cross_encoder"]
    if not ce.weights_path:
        ce_explicit = _explicit_keys("cross_encoder", data)
        ce_over = {k: v for k, v in _TRAINABLE_SMALL_CE.items()
                   if k not in ce_explicit}
        if ce_over:
            sections["cross_encoder"] = dataclasses.replace(ce, **ce_over)


def config_to_dict(cfg: AppConfig, redact_secrets: bool = True) -> Dict[str, Any]:
    """Serialize config, redacting secret-looking fields
    (reference `config.py:1770-1778`)."""

    def serialize(obj: Any) -> Any:
        if is_dataclass(obj):
            out = {}
            for f in fields(obj):
                v = getattr(obj, f.name)
                if redact_secrets and _SECRET_FIELD_RE.search(f.name) and v:
                    v = "***"
                out[f.name] = serialize(v)
            return out
        if isinstance(obj, tuple):
            return list(obj)
        return obj

    return serialize(cfg)
