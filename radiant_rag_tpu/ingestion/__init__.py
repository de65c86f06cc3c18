"""Ingestion: document parsing, chunking, crawling.

Capability parity with reference `radiant/ingestion/`: document processor +
chunk splitter (`processor.py`), code-aware chunking (`code_chunker.py`),
web crawler (`web_crawler.py`), GitHub crawler (`github_crawler.py`),
structured-JSON parsing (`json_parser.py`), VLM image captioning hook
(`image_captioner.py`).
"""

from radiant_rag_tpu.ingestion.processor import (  # noqa: F401
    ChunkSplitter, DocumentProcessor, IngestedChunk,
    IntelligentDocumentProcessor, TranslatingDocumentProcessor,
)
from radiant_rag_tpu.ingestion.code_chunker import CodeChunker, CodeChunk, detect_language  # noqa: F401
from radiant_rag_tpu.ingestion.web_crawler import WebCrawler, normalize_url  # noqa: F401
from radiant_rag_tpu.ingestion.github_crawler import GitHubCrawler  # noqa: F401
from radiant_rag_tpu.ingestion.json_parser import StructuredJSONParser  # noqa: F401
