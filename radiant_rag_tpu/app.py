"""RadiantTPU application facade + CLI.

Capability parity with reference `radiant/app.py` (`RadiantRAG`, `app.py:52`):
ingest_documents (hierarchical parent/child chunking + batched embedding,
`app.py:365-467`), ingest_urls (web crawl), ingest_github (repo crawl with
markdown/code-aware chunking, `app.py:805-1059`), query/query_raw/simple_query,
search (dense/bm25/hybrid), start_conversation, rebuild_bm25_index,
clear_index, check_health, get_stats, and `create_app()` (`app.py:1350`).
CLI subcommands mirror `app.py:1376-1526`: ingest/query/search/interactive/
stats/health/clear/rebuild-bm25.

TPU-first difference: ingest is one on-device pipeline — tokenize (host) ->
embed (flax encoder) -> normalize + binary/int8 quantize -> append to HBM
index rows — instead of torch-embed + Redis round trips.
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radiant_rag_tpu.config import AppConfig, load_config
from radiant_rag_tpu.index.bm25 import PersistentBM25Index
from radiant_rag_tpu.index.factory import create_vector_store
from radiant_rag_tpu.ingestion.processor import DocumentProcessor, IngestedChunk, ChunkSplitter
from radiant_rag_tpu.llm.client import LLMClient
from radiant_rag_tpu.orchestrator import PipelineResult, RAGOrchestrator, SimplifiedOrchestrator
from radiant_rag_tpu.utils.conversation import ConversationManager
from radiant_rag_tpu.utils.logging import setup_logging
from radiant_rag_tpu.utils.metrics import MetricsCollector

logger = logging.getLogger(__name__)


class RadiantTPU:
    """The application facade."""

    def __init__(self, config: Optional[AppConfig] = None,
                 llm: Optional[LLMClient] = None,
                 local_models=None, store=None) -> None:
        self.config = config or load_config()
        from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.store = store if store is not None else create_vector_store(self.config)
        self.llm = llm or LLMClient(self.config.llm)
        if local_models is None:
            from radiant_rag_tpu.models.registry import LocalNLPModels

            local_models = LocalNLPModels(self.config)
        self.local_models = local_models
        self.bm25_index = PersistentBM25Index(
            self.store, path=self.config.bm25.index_path,
            k1=self.config.bm25.k1, b=self.config.bm25.b,
            auto_save_threshold=self.config.bm25.auto_save_threshold,
            max_query_terms=self.config.bm25.max_query_terms,
            max_postings=self.config.bm25.max_postings_per_query,
            persist_max_docs=self.config.bm25.persist_max_docs,
            auto_build=self.config.bm25.auto_build,
            sketch_dim=self.config.bm25.sketch_dim,
            sketch_hbm_budget_gb=self.config.bm25.sketch_hbm_budget_gb,
            disc_route_df_frac=self.config.bm25.disc_route_df_frac,
            pages_route_max_pages=self.config.bm25.pages_route_max_pages,
            pages_route_max_cells=self.config.bm25.pages_route_max_cells,
        )
        if hasattr(self.store, "attach_bm25"):
            # sharded pod backend: hand it the BM25 index (built after the
            # factory ran) so the hybrid collective path is live
            self.store.attach_bm25(self.bm25_index.index)
        self.conversations = ConversationManager(
            max_turns=self.config.conversation.max_turns,
            data_dir=self.config.conversation.data_dir,
            ttl_s=self.config.conversation.ttl_s,
        ) if self.config.conversation.enabled else None
        self.metrics_collector = MetricsCollector()
        from radiant_rag_tpu.utils.cache import QueryCache

        self.query_cache = QueryCache(self.config.cache.query_cache_size,
                                      self.config.cache.query_cache_ttl_s)
        self.processor = DocumentProcessor(
            chunk_size=self.config.ingestion.max_parent_chars // 10,
            overlap=self.config.ingestion.chunk_overlap,
            pdf_strategy=self.config.ingestion.pdf_strategy,
        )
        self.orchestrator = RAGOrchestrator(
            self.config, self.store, self.bm25_index, self.local_models, self.llm,
            conversation_manager=self.conversations,
            metrics_collector=self.metrics_collector,
        )
        self._simple = SimplifiedOrchestrator(self.store, self.local_models, self.llm)

    # ------------------------------------------------------------------
    # ingestion
    # ------------------------------------------------------------------
    def ingest_documents(self, paths: Sequence[str], recursive: bool = True) -> Dict[str, Any]:
        """Parse -> hierarchical chunks -> embed (device) -> upsert -> BM25 sync
        (reference `app.py:247-467`)."""
        t0 = time.time()
        chunks = self.processor.process_paths(paths, recursive=recursive)
        return self._ingest_chunks(chunks, t0)

    def ingest_chunks(self, chunks: Sequence[IngestedChunk]) -> Dict[str, Any]:
        return self._ingest_chunks(list(chunks), time.time())

    def _ingest_chunks(self, chunks: List[IngestedChunk], t0: float) -> Dict[str, Any]:
        cfg = self.config.ingestion
        parents = 0
        children: List[Tuple[str, Dict[str, Any]]] = []
        if cfg.hierarchical:
            splitter = ChunkSplitter(cfg.child_chunk_size, cfg.chunk_overlap)
            parent_docs: List[Tuple[str, Dict[str, Any]]] = []
            for chunk in chunks:
                pmeta = {**chunk.meta, "doc_level": "parent"}
                parent_id = self.store.make_doc_id(chunk.content, pmeta)
                parent_docs.append((chunk.content, pmeta))
                for j, piece in enumerate(splitter.split(chunk.content)):
                    children.append((piece, {**chunk.meta, "doc_level": "leaf",
                                             "parent_id": parent_id,
                                             "chunk_index": j}))
            self.store.upsert_doc_only_batch(parent_docs)
            parents = len(parent_docs)
        else:
            children = [(c.content, {**c.meta, "doc_level": "leaf"}) for c in chunks]

        # batched embed on device + upsert (quantized side-cars always written)
        # pre-size the index for the whole load: the chunk count is known
        # here, so one growth replaces a recompile per capacity doubling
        if hasattr(self.store, "reserve"):
            self.store.reserve(len(children))
        n = 0
        bs = max(cfg.upsert_batch_size, 1)
        for start in range(0, len(children), bs):
            batch = children[start : start + bs]
            embeddings = self.local_models.embed([c for c, _m in batch])
            self.store.upsert_batch([
                (content, meta, embeddings[i]) for i, (content, meta) in enumerate(batch)
            ])
            n += len(batch)

        added, removed = self.bm25_index.sync_with_store()
        self.query_cache.clear()  # index changed; cached answers are stale
        if self.config.index.auto_persist and hasattr(self.store, "save"):
            try:
                self.store.save(self.config.index.data_dir)
            except Exception as exc:
                logger.warning("index auto-persist failed: %s", exc)
        return {
            "chunks_ingested": n,
            "parents": parents,
            "bm25_added": added,
            "bm25_removed": removed,
            "duration_s": round(time.time() - t0, 2),
        }

    def ingest_urls(self, urls: Sequence[str]) -> Dict[str, Any]:
        """Crawl + ingest (reference `app.py` ingest_urls)."""
        from radiant_rag_tpu.ingestion.web_crawler import WebCrawler

        wc = self.config.web_crawler
        crawler = WebCrawler(
            max_depth=wc.max_depth, max_pages=wc.max_pages,
            same_domain_only=wc.same_domain_only,
            rate_limit_delay_s=wc.rate_limit_delay_s, timeout_s=wc.timeout_s,
            include_patterns=wc.include_patterns, exclude_patterns=wc.exclude_patterns,
        )
        chunks: List[IngestedChunk] = []
        pages = 0
        for url in urls:
            for result in crawler.crawl(url):
                pages += 1
                for j, piece in enumerate(self.processor.splitter.split(result.text)):
                    chunks.append(IngestedChunk(
                        content=piece,
                        meta={"source": result.url, "title": result.title,
                              "chunk_index": j}))
        stats = self._ingest_chunks(chunks, time.time())
        stats["pages_crawled"] = pages
        return stats

    def ingest_github(self, url: str) -> Dict[str, Any]:
        """Crawl a GitHub repo with content-aware chunking
        (reference `app.py:805-1059`)."""
        from radiant_rag_tpu.ingestion.github_crawler import GitHubCrawler
        from radiant_rag_tpu.ingestion.code_chunker import CodeChunker, detect_language

        gh = self.config.github
        crawler = GitHubCrawler(token=gh.token, max_files=gh.max_files,
                                include_extensions=gh.include_extensions)
        files = crawler.crawl(url)
        code_chunker = CodeChunker()
        chunks: List[IngestedChunk] = []
        for f in files:
            lang = detect_language(f.path)
            if lang:
                for c in code_chunker.chunk_text(f.content, lang, source=f.path):
                    chunks.append(IngestedChunk(content=c.to_indexable_text(),
                                                meta={"source": f.url, **c.meta()}))
            elif f.path.lower().endswith((".md", ".markdown")):
                for j, piece in enumerate(self._chunk_markdown(f.content)):
                    chunks.append(IngestedChunk(content=piece,
                                                meta={"source": f.url, "chunk_index": j}))
            else:
                for j, piece in enumerate(self.processor.splitter.split(f.content)):
                    chunks.append(IngestedChunk(content=piece,
                                                meta={"source": f.url, "chunk_index": j}))
        stats = self._ingest_chunks(chunks, time.time())
        stats["files_fetched"] = len(files)
        return stats

    @staticmethod
    def _chunk_markdown(text: str, max_chars: int = 3000) -> List[str]:
        """Header-section + paragraph-merge markdown chunking
        (reference `app.py:805-1059`)."""
        sections = re.split(r"(?m)(?=^#{1,6}\s)", text)
        out: List[str] = []
        for section in sections:
            section = section.strip()
            if not section:
                continue
            if len(section) <= max_chars:
                if out and len(out[-1]) + len(section) < max_chars // 2:
                    out[-1] += "\n\n" + section
                else:
                    out.append(section)
            else:
                paras = section.split("\n\n")
                cur = ""
                for p in paras:
                    if len(cur) + len(p) + 2 > max_chars and cur:
                        out.append(cur)
                        cur = p
                    else:
                        cur = f"{cur}\n\n{p}" if cur else p
                if cur:
                    out.append(cur)
        return out

    # ------------------------------------------------------------------
    # querying
    # ------------------------------------------------------------------
    def query(self, question: str, conversation_id: str = "",
              use_cache: bool = True, progress: Optional[Any] = None) -> PipelineResult:
        """Full agentic query; repeated questions (outside conversations) are
        served from the TTL'd query cache (reference `utils/cache.py:150`,
        headline "repeated query <1s", README.md:723). `progress(event,
        step_name, info)` observes phase boundaries live (TUI timeline,
        /query/stream)."""
        if use_cache and not conversation_id:
            cached = self.query_cache.get("query", question)
            if cached is not None:
                return cached
        history = []
        if conversation_id and self.conversations is not None:
            history = self.conversations.get_history_for_synthesis(conversation_id)
        result = self.orchestrator.run(question, conversation_id=conversation_id,
                                       conversation_history=history,
                                       progress=progress)
        if use_cache and not conversation_id and result.success and not result.low_confidence:
            self.query_cache.put("query", question, result)
        return result

    def query_raw(self, question: str) -> Dict[str, Any]:
        return self.query(question).to_dict()

    def query_stream(self, question: str, conversation_id: str = ""):
        """Streaming query: yields progress events as phases complete, then a
        final result event (server /query/stream). Event dicts:
          {"event": "step_start"|"step_end", "step": str, ...info}
          {"event": "result", ...PipelineResult.to_dict(), "answer": str}
        Cache hits yield the result immediately with no progress events."""
        cached = None
        if not conversation_id:
            cached = self.query_cache.get("query", question)
        if cached is not None:
            yield {"event": "result", "cached": True,
                   **cached.to_dict(), "answer": cached.answer}
            return
        import queue as _queue
        import threading as _threading

        q: "_queue.Queue" = _queue.Queue()

        def progress(event, step, info):
            q.put({"event": event, "step": step, **info})

        history = []
        if conversation_id and self.conversations is not None:
            history = self.conversations.get_history_for_synthesis(conversation_id)

        def runner():
            try:
                result = self.orchestrator.run(
                    question, conversation_id=conversation_id,
                    conversation_history=history, progress=progress,
                    token_sink=lambda chunk: q.put(
                        {"event": "token", "text": chunk}))
                if (not conversation_id and result.success
                        and not result.low_confidence):
                    self.query_cache.put("query", question, result)
                q.put({"event": "result", **result.to_dict(),
                       "answer": result.answer})
            except Exception as exc:  # surface as a terminal error event
                q.put({"event": "error", "error": f"{type(exc).__name__}: {exc}"})
            finally:
                q.put(None)

        t = _threading.Thread(target=runner, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join(timeout=5.0)

    def simple_query(self, question: str) -> str:
        """Minimal RAG path (reference `app.py:1159`)."""
        return self._simple.run(question)

    def warmup(self, max_batch: int = 256, top_k: int = 10,
               modes: Sequence[str] = ("hybrid",),
               full_ladder: bool = False,
               progress=None) -> Dict[str, float]:
        """Progressively compile the serving programs before taking traffic.

        Cold compilation of a LARGE-batch program over a large corpus can
        stall for tens of minutes in remote compile services (autotuning over
        the (B, N) score buffers); compiling a small batch first makes the
        large-batch compile take seconds (measured at 1M docs: B=1024 cold
        >20 min, vs B=32 cold 127 s then B=1024 in 10.7 s). Serve calls this
        when --warmup is set; the `warmup` CLI calls it with full_ladder=True
        to precompile EVERY serving bucket into the persistent compile cache
        (docs/OPERATIONS.md "Cold start"). max_batch<=0 resolves to the
        engine's HBM-gated max bucket. Returns per-stage seconds."""
        import time as _time

        if self.store.count_documents() == 0:
            return {}
        engine = getattr(self.store, "engine", None)
        if max_batch <= 0:
            # size to the HYBRID gate where a fused searcher exists: at the
            # pages-only 10M tier it admits smaller buckets than the
            # engine's (chunked-select) gate, and warming unusable buckets
            # would compile programs serving can never dispatch
            searcher = self._fused_searcher()
            if searcher is not None:
                max_batch = searcher.max_query_bucket()
            else:
                max_batch = engine.max_query_bucket() if engine is not None else 256
        if engine is not None:
            # EVERY bucket the coalescer can round a live batch up to: an
            # unwarmed bucket ambushes a request with the per-process
            # first-execution stall (seconds on a tunneled chip), so serving
            # warmup must walk the full reachable ladder, small ones first
            # (the progressive-compile trick). full_ladder additionally walks
            # past max_batch via the CLI's explicit --max-batch.
            buckets = [1] + [b for b in engine.QUERY_BUCKETS
                             if 4 <= b <= max_batch]
        else:
            buckets = [b for b in (1, 32, max_batch) if b <= max(max_batch, 1)]
        timings: Dict[str, float] = {}
        probe = "warmup probe query"
        for mode in modes:
            for b in dict.fromkeys(buckets):  # dedup, keep order
                t0 = _time.time()
                self.search_batch([probe] * b, mode=mode, top_k=top_k,
                                  use_cache=False)
                timings[f"{mode}/b{b}"] = round(_time.time() - t0, 2)
                if progress is not None:
                    progress(f"{mode}/b{b}", timings[f"{mode}/b{b}"])
        if full_ladder and "hybrid" in modes:
            # fusion="auto" can resolve to either device-program variant after
            # a (re)calibration, so the deploy-time ladder precompiles BOTH —
            # the already-selected one is a compile-cache hit, the other won't
            # ambush the first post-recalibration query.
            searcher = self._fused_searcher()
            if searcher is not None:
                import numpy as _np

                from radiant_rag_tpu.index.hybrid import embed_queries_device

                e1 = _np.asarray(self.local_models.embed([probe]), _np.float32)
                dmode = (self.store._default_mode()
                         if hasattr(self.store, "_default_mode") else "int8")
                for b in dict.fromkeys(buckets):
                    texts = [probe] * b
                    embs = _np.repeat(e1, b, axis=0)
                    # Serving dispatch (`_dispatch_fused`) runs the
                    # device-resident qdev program variant, whose jit cache
                    # key includes the fusion string — warm THAT for both
                    # fusion modes, plus the host-blob variant as the
                    # fallback-path warm (qdev unavailable => host embed).
                    qdev = embed_queries_device(
                        self.local_models, searcher.engine, texts)
                    for fv in ("confidence", "score"):
                        t0 = _time.time()
                        if qdev is not None:
                            searcher.search_rows(
                                None, texts, dense_k=top_k, bm25_k=top_k,
                                fused_k=top_k,
                                rrf_k=self.config.retrieval.rrf_k,
                                mode=dmode, fusion=fv, _qdev=qdev)
                        searcher.search_rows(
                            embs, texts, dense_k=top_k, bm25_k=top_k,
                            fused_k=top_k, rrf_k=self.config.retrieval.rrf_k,
                            mode=dmode, fusion=fv)
                        timings[f"hybrid/{fv}/b{b}"] = round(_time.time() - t0, 2)
                        if progress is not None:
                            progress(f"hybrid/{fv}/b{b}", timings[f"hybrid/{fv}/b{b}"])
        # ingest-side embed program (deploy-time `warmup` CLI only — serve's
        # startup warmup should not pay it): the bulk-embed bucket
        # (embedding.batch_size, default 1024) is a different shape from the
        # serving query buckets above, and its cold compile (~100 s on a
        # tunneled chip) otherwise lands inside the user's first ingest
        emb = getattr(self.local_models, "embedder", None)
        if full_ladder and emb is not None and hasattr(emb, "_compute"):
            bs = self.config.embedding.batch_size
            t0 = _time.time()
            emb._compute([f"{probe} {i}" for i in range(bs)])
            timings[f"ingest_embed/b{bs}"] = round(_time.time() - t0, 2)
            if progress is not None:
                progress(f"ingest_embed/b{bs}", timings[f"ingest_embed/b{bs}"])
        logger.info("warmup compiled %s", timings)
        return timings

    def train(self, steps: int = 100, batch_size: int = 32,
              learning_rate: float = 2e-5, checkpoint_dir: str = "",
              hard_negatives: int = 2, auto: bool = False) -> Dict[str, float]:
        """Fine-tune the embedder on the indexed corpus and make the result
        LIVE: BM25-mined hard negatives + warmup/cosine LR
        (`parallel/data.train_embedder`), then hot-swap the serving encoder's
        params (embedding cache cleared) and invalidate fusion calibration so
        the newly-trained dense leg is re-weighted instead of keeping its
        pre-train (often ~0) weight. A later fresh process restores the same
        params from the checkpoint (`models/embedder.py`).

        auto=True runs the measured capacity recipe as a product path (no
        harness flags): 12k-step ceiling with accuracy-plateau stopping
        (min 5000 steps, 2500-step window — the r4 100k-corpus run showed
        the looser defaults stop the encoder at 60% of its reachable
        quality), batch 256 (in-batch negatives scale with batch: dense MRR
        0.308 -> 0.463 at 100k docs moving 64 -> 256), lr 1e-4
        warmup+cosine, BM25-mined hard negatives, and mixed paraphrase
        query augmentation (30% verbatim / 40% partial synonym swap / 30%
        full stopword-dropped paraphrase — `parallel/data.
        paraphrase_augment`) so the encoder learns the paraphrase
        correspondences retrieval is measured on. Pairs with the `trainable-small`
        embedding preset (`config.py`). The reference deploys with
        pretrained MiniLM weights (`llm/local_models.py:61-135`); this is
        the weightless-deploy equivalent: ingest -> train --auto -> a
        contributing dense leg."""
        from radiant_rag_tpu.parallel.data import paraphrase_augment, train_embedder

        if auto:
            steps = max(steps, 12000)
            batch_size = max(batch_size, 256)
            learning_rate = 1e-4
            hard_negatives = max(hard_negatives, 2)
        metrics, params = train_embedder(
            self.store, self.config.embedding, steps=steps,
            batch_size=batch_size, learning_rate=learning_rate,
            checkpoint_dir=checkpoint_dir or self.config.embedding.checkpoint_dir,
            bm25=self.bm25_index.index if hard_negatives > 0 else None,
            hard_negatives=hard_negatives, return_params=True,
            query_augment=paraphrase_augment if auto else None,
            auto_stop=auto,
            **({"min_steps": 5000, "plateau_window": 2500,
                "plateau_eps": 0.005} if auto else {}))
        self.local_models.embedder.set_params(params)
        self.query_cache.clear()  # search results embed with the old encoder
        if hasattr(self.orchestrator, "invalidate_fusion_calibration"):
            self.orchestrator.invalidate_fusion_calibration()
        return metrics

    def search(self, query: str, mode: str = "hybrid", top_k: int = 10,
               use_cache: bool = True) -> List[Tuple[Any, float]]:
        """Retrieval-only (reference `app.py:1178`)."""
        if use_cache:
            cached = self.query_cache.get("search", query, mode=mode, top_k=top_k)
            if cached is not None:
                return list(cached)  # copy: protect the cached list from mutation
        hits = self._search_uncached(query, mode, top_k)
        if use_cache:
            self.query_cache.put("search", query, hits, mode=mode, top_k=top_k)
        return hits

    def _cache_scan(self, queries: List[str], mode: str, top_k: int,
                    use_cache: bool) -> Tuple[List[Any], List[int]]:
        """Pre-fill results from the query cache; returns (out, miss idxs)."""
        out: List[Any] = [None] * len(queries)
        if not use_cache:
            return out, list(range(len(queries)))
        miss: List[int] = []
        for i, q in enumerate(queries):
            cached = self.query_cache.get("search", q, mode=mode, top_k=top_k)
            if cached is not None:
                out[i] = list(cached)
            else:
                miss.append(i)
        return out, miss

    def _cache_fill(self, queries: List[str], out: List[Any], miss: List[int],
                    resolved: List[Any], mode: str, top_k: int,
                    use_cache: bool) -> None:
        for j, i in enumerate(miss):
            out[i] = resolved[j]
            if use_cache:
                self.query_cache.put("search", queries[i], resolved[j],
                                     mode=mode, top_k=top_k)

    def search_batch(self, queries: List[str], mode: str = "hybrid",
                     top_k: int = 10, use_cache: bool = True) -> List[List[Tuple[Any, float]]]:
        """Batched retrieval: ONE device program for the whole batch (the
        serving layer coalesces concurrent requests into this — server.py)."""
        out, miss = self._cache_scan(queries, mode, top_k, use_cache)
        if miss:
            res = self._search_uncached_batch([queries[i] for i in miss], mode, top_k)
            self._cache_fill(queries, out, miss, res, mode, top_k, use_cache)
        return out

    def _search_uncached(self, query: str, mode: str, top_k: int) -> List[Tuple[Any, float]]:
        return self._search_uncached_batch([query], mode, top_k)[0]

    def _fused_searcher(self):
        """The fused single-program hybrid searcher, refreshed for serving
        (None when the TPU engine isn't backing the store or it's empty)."""
        searcher = getattr(self.orchestrator, "_hybrid", None)
        if searcher is None or self.store.count_documents() == 0:
            return None
        if not getattr(self.orchestrator, "_hybrid_serves", True):
            # sharded pod store: _hybrid exists only to run calibration over
            # the source engine — serving goes through store.search_hybrid
            return None
        searcher.bm25 = self.bm25_index.index  # re-resolve after any reload
        if hasattr(self.orchestrator, "_ensure_fusion_calibration"):
            self.orchestrator._ensure_fusion_calibration()
        return searcher

    def _dispatch_fused(self, searcher, queries: List[str], top_k: int,
                        fetch: bool = True):
        # Device-resident hand-off: embed to a device array padded to the
        # engine's query bucket and pass it straight into the fused program —
        # the embeddings never visit the host (saves a blocking d2h fetch +
        # re-upload per batch; ~27 ms each way on a tunneled chip).
        from radiant_rag_tpu.index.hybrid import embed_queries_device

        embs = None
        qdev = embed_queries_device(self.local_models, searcher.engine, queries)
        if qdev is None:
            embs = self.local_models.embed(queries)
        return searcher.search_rows(
            embs, list(queries), dense_k=top_k, bm25_k=top_k,
            fused_k=top_k, rrf_k=self.config.retrieval.rrf_k,
            mode=self.store._default_mode() if hasattr(self.store, "_default_mode") else "int8",
            rescore_multiplier=self.config.quantization.rescore_multiplier,
            fusion=getattr(self.config.retrieval, "fusion_weighting", "confidence"),
            fetch=fetch, _qdev=qdev)

    def _resolve_fused_rows(self, res, n_queries: int) -> List[List[Tuple[Any, float]]]:
        scores, rows = res["fused"]
        batched = []
        for qi in range(n_queries):
            hits = []
            for s, r in zip(scores[qi], rows[qi]):
                if r < 0:
                    continue
                doc_id = self.store.id_for_row(int(r))
                doc = self.store.get_doc(doc_id) if doc_id else None
                if doc is not None:
                    hits.append((doc, float(s)))
            batched.append(hits)
        return batched

    def search_batch_async(self, queries: List[str], mode: str = "hybrid",
                           top_k: int = 10, use_cache: bool = True):
        """Two-phase search_batch: dispatch the device program NOW, return a
        complete() that blocks for + resolves the results. The serving
        coalescer uses this to keep batches in flight so one batch's
        device->host fetch overlaps the next batch's dispatch (the bench's
        pipelined mode, `RequestCoalescer(run_batch_async=...)`). Modes
        without a device seam complete synchronously."""
        searcher = self._fused_searcher() if mode == "hybrid" else None
        if searcher is None:
            res = self.search_batch(queries, mode=mode, top_k=top_k,
                                    use_cache=use_cache)
            return lambda: res
        out, miss = self._cache_scan(queries, mode, top_k, use_cache)
        if not miss:
            return lambda: out
        miss_q = [queries[i] for i in miss]
        _, unpack = self._dispatch_fused(searcher, miss_q, top_k, fetch=False)

        def complete() -> List[List[Tuple[Any, float]]]:
            resolved = self._resolve_fused_rows(unpack(), len(miss_q))
            self._cache_fill(queries, out, miss, resolved, mode, top_k,
                             use_cache)
            return out

        complete.pipelined = True  # real device seam (stats honesty)
        return complete

    def _search_uncached_batch(self, queries: List[str], mode: str,
                               top_k: int) -> List[List[Tuple[Any, float]]]:
        if mode == "dense":
            embs = self.local_models.embed(queries)
            return self.store.retrieve_by_embedding_batch(embs, top_k=top_k)
        if mode == "bm25":
            return self.bm25_index.search_batch(queries, top_k=top_k)
        # hybrid: the fused single-program path when the TPU engine backs the
        # store; the pod collective path when the store is sharded;
        # otherwise per-run retrieval + host RRF
        searcher = self._fused_searcher()
        if searcher is not None:
            res = self._dispatch_fused(searcher, queries, top_k)
            return self._resolve_fused_rows(res, len(queries))
        if getattr(self.store, "can_hybrid", False):
            # pod collective path; calibration (over the source engine)
            # installs mode+weights on the pod store first
            self.orchestrator.calibrate_pod_fusion()
            embs = self.local_models.embed(queries)
            from radiant_rag_tpu.index.hybrid import resolve_fused_depth

            return self.store.search_hybrid(
                embs, queries, top_k=top_k, fused_k=top_k,
                rrf_k=self.config.retrieval.rrf_k,
                fused_depth=resolve_fused_depth(self.config.retrieval))
        embs = self.local_models.embed(queries)
        dense = self.store.retrieve_by_embedding_batch(embs, top_k=top_k)
        sparse = self.bm25_index.search_batch(queries, top_k=top_k)
        from radiant_rag_tpu.agents.fusion import RRFAgent

        rrf = RRFAgent(rrf_k=self.config.retrieval.rrf_k)
        return [rrf.fuse([dense[i], sparse[i]], top_k=top_k)
                for i in range(len(queries))]

    def start_conversation(self) -> str:
        if self.conversations is None:
            raise RuntimeError("conversations disabled in config")
        return self.conversations.start_conversation()

    # ------------------------------------------------------------------
    # admin
    # ------------------------------------------------------------------
    def rebuild_bm25_index(self) -> int:
        n = self.bm25_index.build_from_store()
        if hasattr(self.store, "attach_bm25"):
            self.store.attach_bm25(self.bm25_index.index)  # re-shard base
        return n

    def clear_index(self) -> None:
        self.store.drop_index()
        self.bm25_index.build_from_store()
        self.bm25_index.save()
        self.query_cache.clear()
        # persist the cleared state: without this the auto-persisted index on
        # disk would resurrect every "cleared" doc at the next startup
        if self.config.index.auto_persist and hasattr(self.store, "save"):
            try:
                self.store.save(self.config.index.data_dir)
            except Exception as exc:
                logger.warning("persisting cleared index failed: %s", exc)

    def save_index(self, directory: str = "") -> None:
        d = directory or self.config.index.data_dir
        if hasattr(self.store, "save"):
            self.store.save(d)
        self.bm25_index.save()

    def check_health(self) -> Dict[str, Any]:
        health = {"store": False, "bm25": False, "models": False, "llm": False}
        try:
            health["store"] = self.store.ping()
        except Exception:
            pass
        try:
            health["bm25"] = self.bm25_index.get_stats() is not None
        except Exception:
            pass
        try:
            health["models"] = self.local_models.embed_single("health check").shape[0] > 0
        except Exception:
            pass
        try:
            health["llm"] = self.llm.backend.ping()
        except Exception:
            pass
        health["ok"] = all(v for k, v in health.items() if k != "llm")
        return health

    def get_stats(self) -> Dict[str, Any]:
        from radiant_rag_tpu.utils.cache import get_embedding_cache

        return {
            "index": self.store.get_index_info(),
            "bm25": self.bm25_index.get_stats(),
            "llm": self.llm.stats(),
            "caches": {"query": self.query_cache.stats(),
                       "embedding": self.local_models.embedder.cache.stats()
                       if hasattr(self.local_models, "embedder") else {}},
            "runs": self.metrics_collector.summary(),
            "agents": self.orchestrator.get_agent_stats(),
        }


def create_app(config: Optional[AppConfig] = None, **kwargs: Any) -> RadiantTPU:
    return RadiantTPU(config=config, **kwargs)


# ----------------------------------------------------------------------
# CLI (reference `app.py:1363-1526`)
# ----------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="radiant-tpu", description="TPU-native agentic RAG framework")
    parser.add_argument("--config", default="", help="path to YAML config")
    parser.add_argument("-v", "--verbose", action="store_true")
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("ingest", help="ingest documents")
    p.add_argument("paths", nargs="+")
    p.add_argument("--no-recursive", action="store_true")

    p = sub.add_parser("ingest-urls", help="crawl and ingest web pages")
    p.add_argument("urls", nargs="+")

    p = sub.add_parser("ingest-github", help="ingest a GitHub repository")
    p.add_argument("url")

    p = sub.add_parser("query", help="run the full agentic pipeline")
    p.add_argument("question")
    p.add_argument("--conversation", default="")
    p.add_argument("--report", default="", help="save report to file (.md/.html/.json/.txt)")

    p = sub.add_parser("search", help="retrieval only")
    p.add_argument("query")
    p.add_argument("--mode", choices=["hybrid", "dense", "bm25"], default="hybrid")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--save", default="", help="save a search report to file")

    p = sub.add_parser("simple-query", help="minimal RAG (no agents)")
    p.add_argument("question")

    p = sub.add_parser("train", help="fine-tune the embedder on the indexed corpus")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--checkpoint-dir", default="",
                   help="orbax output dir (default: embedding.checkpoint_dir)")
    p.add_argument("--hard-negatives", type=int, default=2, metavar="H",
                   help="BM25-mined hard negatives per query (0 disables)")
    p.add_argument("--auto", action="store_true",
                   help="measured capacity recipe: 12k-step ceiling with "
                        "accuracy-plateau stopping, hard negatives, synonym "
                        "query augmentation (weightless-deploy bootstrap)")

    p = sub.add_parser("serve", help="HTTP JSON API server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--warmup", type=int, default=-1, metavar="MAX_BATCH",
                   help="progressively compile search programs up to this "
                        "batch size before serving (avoids a multi-minute "
                        "first-request compile on large corpora). Default: "
                        "the coalescer's server.max_batch; 0 disables")

    p = sub.add_parser(
        "warmup", help="precompile the serving bucket ladder into the "
                       "persistent compile cache (deploy-time cold-start fix)")
    p.add_argument("--max-batch", type=int, default=0,
                   help="top bucket to compile (default: the engine's "
                        "HBM-gated max for the loaded corpus)")
    p.add_argument("--modes", default="hybrid",
                   help="comma-separated search modes to compile")

    sub.add_parser("interactive", help="interactive query loop")
    sub.add_parser("stats", help="index and pipeline statistics")
    sub.add_parser("health", help="component health check")
    sub.add_parser("clear", help="drop the index")
    sub.add_parser("rebuild-bm25", help="rebuild the BM25 index from the store")
    sub.add_parser("tui", help="terminal UI")
    return parser


def main(argv: Optional[Sequence[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    config = load_config(args.config or None)
    setup_logging("DEBUG" if args.verbose else config.logging.level,
                  file=config.logging.file, color=config.logging.color)
    if not args.command:
        build_parser().print_help()
        return 1

    app = create_app(config)
    from radiant_rag_tpu.ui.display import (
        display_answer, display_health, display_search_results, display_stats,
    )

    if args.command == "ingest":
        stats = app.ingest_documents(args.paths, recursive=not args.no_recursive)
        print(json.dumps(stats, indent=2))
    elif args.command == "ingest-urls":
        print(json.dumps(app.ingest_urls(args.urls), indent=2))
    elif args.command == "ingest-github":
        print(json.dumps(app.ingest_github(args.url), indent=2))
    elif args.command == "query":
        result = app.query(args.question, conversation_id=args.conversation)
        display_answer(result)
        if args.report:
            from radiant_rag_tpu.ui.reports import QueryReport

            QueryReport.from_pipeline_result(result).save(args.report)
            print(f"report saved to {args.report}")
    elif args.command == "search":
        hits = app.search(args.query, mode=args.mode, top_k=args.top_k)
        display_search_results(args.query, hits)
        if args.save:
            from radiant_rag_tpu.ui.reports import save_search_report

            save_search_report(args.query, hits, args.save)
            print(f"search report saved to {args.save}")
    elif args.command == "simple-query":
        print(app.simple_query(args.question))
    elif args.command == "interactive":
        print("radiant-tpu interactive mode — empty line to exit")
        cid = app.start_conversation() if app.conversations else ""
        while True:
            try:
                q = input("query> ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if not q:
                break
            display_answer(app.query(q, conversation_id=cid))
    elif args.command == "serve":
        from radiant_rag_tpu.server import serve

        # warm by default: the bucket the coalescer will actually use —
        # operators should not need a flag to avoid a minutes-long first
        # request on large corpora (persistent cache makes this one-time)
        warm_to = config.server.max_batch if args.warmup < 0 else args.warmup
        if warm_to > 0 and app.store.count_documents() > 0:
            print(f"warming search programs up to batch {warm_to}…")
            print(app.warmup(max_batch=warm_to))
        serve(app, host=args.host, port=args.port)
    elif args.command == "warmup":
        from radiant_rag_tpu.utils.compile_cache import DEFAULT_CACHE_DIR

        n = app.store.count_documents()
        if n == 0:
            print("nothing to warm: index is empty")
            return 1
        print(f"precompiling serving bucket ladder for {n} docs "
              f"(cache: {DEFAULT_CACHE_DIR})…")
        timings = app.warmup(
            max_batch=args.max_batch, full_ladder=True,
            modes=[m.strip() for m in args.modes.split(",") if m.strip()],
            progress=lambda stage, s: print(f"  {stage}: {s:.1f}s", flush=True))
        total = sum(timings.values())
        print(f"done: {len(timings)} programs in {total:.1f}s — "
              "fresh processes now start warm")
    elif args.command == "train":
        metrics = app.train(
            steps=args.steps, batch_size=args.batch_size,
            learning_rate=args.lr, checkpoint_dir=args.checkpoint_dir,
            hard_negatives=args.hard_negatives, auto=args.auto)
        print(json.dumps(metrics))
    elif args.command == "stats":
        display_stats(app.get_stats())
    elif args.command == "health":
        health = app.check_health()
        display_health(health)
        return 0 if health["ok"] else 2
    elif args.command == "clear":
        app.clear_index()
        print("index cleared")
    elif args.command == "rebuild-bm25":
        n = app.rebuild_bm25_index()
        print(f"BM25 index rebuilt: {n} docs")
    elif args.command == "tui":
        from radiant_rag_tpu.ui.tui import run_tui

        run_tui(app)
    return 0


if __name__ == "__main__":
    sys.exit(main())
