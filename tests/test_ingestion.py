"""Ingestion tests: processor, chunk splitter, code chunker, crawlers, JSON.

Reference analog: `tests/test_all.py:812-918` (chunk splitter + ingest
helpers), `:1618-1765` (URL normalizer / link extractor / crawl result) —
the reference leaves `tests/test_ingestion/` empty (SURVEY.md §4)."""

import json

import pytest

from radiant_rag_tpu.ingestion.processor import (
    ChunkSplitter, DocumentProcessor, html_to_text,
)
from radiant_rag_tpu.ingestion.code_chunker import CodeChunker, detect_language
from radiant_rag_tpu.ingestion.web_crawler import WebCrawler, extract_links, normalize_url
from radiant_rag_tpu.ingestion.github_crawler import is_github_url, parse_github_url
from radiant_rag_tpu.ingestion.json_parser import StructuredJSONParser


# -- splitter ---------------------------------------------------------------
def test_chunk_splitter_sizes():
    sp = ChunkSplitter(chunk_size=100, overlap=20)
    text = "word " * 100  # 500 chars
    chunks = sp.split(text)
    assert all(len(c) <= 100 for c in chunks)
    assert len(chunks) >= 5
    # overlap: consecutive chunks share content
    assert chunks[0][-10:].strip() != ""


def test_chunk_splitter_short_text():
    sp = ChunkSplitter(chunk_size=100, overlap=10)
    assert sp.split("short") == ["short"]
    assert sp.split("") == []


def test_chunk_splitter_rejects_bad_overlap():
    with pytest.raises(ValueError):
        ChunkSplitter(chunk_size=10, overlap=10)


# -- processor --------------------------------------------------------------
def test_process_text_file(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("A paragraph about testing.\n\n" + "More content here. " * 50)
    proc = DocumentProcessor(chunk_size=200, overlap=20)
    chunks = proc.process_file(str(p))
    assert chunks
    assert all(c.meta["source"] == str(p) for c in chunks)
    assert all(len(c.content) <= 200 for c in chunks)


def test_process_html_file(tmp_path):
    p = tmp_path / "page.html"
    p.write_text("<html><head><title>T</title><script>bad()</script></head>"
                 "<body><h1>Header</h1><p>Visible text.</p></body></html>")
    proc = DocumentProcessor()
    chunks = proc.process_file(str(p))
    assert chunks
    assert "Visible text" in chunks[0].content
    assert "bad()" not in chunks[0].content
    assert chunks[0].meta.get("title") == "T"


def test_html_to_text():
    text, title = html_to_text("<title>Hi</title><p>one</p><p>two</p>")
    assert title == "Hi"
    assert "one" in text and "two" in text


def test_process_paths_directory(tmp_path):
    (tmp_path / "a.txt").write_text("alpha content for testing purposes")
    (tmp_path / "b.md").write_text("# beta\n\nmarkdown content for testing")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.txt").write_text("gamma content nested for testing")
    proc = DocumentProcessor()
    chunks = proc.process_paths([str(tmp_path)])
    sources = {c.meta["source"] for c in chunks}
    assert len(sources) == 3


# -- code chunker -----------------------------------------------------------
PY_SRC = '''
import os
from typing import List

CONSTANT = 42

def top_level(x):
    """Doc."""
    return x + 1

class Widget:
    def method_a(self):
        return 1

    def method_b(self):
        return 2
'''


def test_python_ast_chunking():
    chunker = CodeChunker()
    chunks = chunker.chunk_text(PY_SRC, "python", source="widget.py")
    kinds = {(c.kind, c.name) for c in chunks}
    assert ("function", "top_level") in kinds
    assert ("method", "method_a") in kinds
    assert ("class", "Widget") in kinds
    method = next(c for c in chunks if c.name == "method_a")
    assert method.parent == "Widget"
    assert "import os" in method.imports
    txt = method.to_indexable_text()
    assert "python method: Widget.method_a" in txt


def test_language_detection():
    assert detect_language("x.py") == "python"
    assert detect_language("x.rs") == "rust"
    assert detect_language("x.unknown") is None


def test_js_regex_chunking():
    src = "const a = 1;\nfunction foo() { return 1; }\nclass Bar { }\n"
    chunks = CodeChunker(min_chunk_chars=5).chunk_text(src, "javascript")
    names = [c.name for c in chunks if c.name]
    assert "foo" in names or any("foo" in c.content for c in chunks)


def test_large_block_splitting():
    body = "\n".join(f"    x{i} = {i}" for i in range(400))
    src = f"def big():\n{body}\n"
    chunks = CodeChunker(max_chunk_chars=1000).chunk_text(src, "python")
    assert all(len(c.content) <= 1100 for c in chunks)
    assert len(chunks) > 3


# -- web crawler ------------------------------------------------------------
def test_normalize_url():
    assert normalize_url("HTTP://Example.COM:80/path#frag") == "http://example.com/path"
    assert normalize_url("https://a.com:443/") == "https://a.com/"
    assert normalize_url("https://a.com:8443/x") == "https://a.com:8443/x"
    assert normalize_url("ftp://a.com/x") is None
    assert normalize_url("/rel", base="https://a.com/dir/") == "https://a.com/rel"


def test_extract_links():
    html = '<a href="/one">1</a> <a href="https://other.com/two#x">2</a>'
    links = extract_links(html, "https://base.com/start")
    assert "https://base.com/one" in links
    assert "https://other.com/two" in links


def test_crawler_bfs_with_fake_fetcher():
    pages = {
        "https://site.com/": '<html><body>root <a href="/a">a</a><a href="/b">b</a>'
                             '<a href="https://other.com/x">ext</a></body></html>',
        "https://site.com/a": "<html><body>page a content here</body></html>",
        "https://site.com/b": "<html><body>page b content here</body></html>",
    }

    def fetcher(url):
        return pages.get(url, ""), "text/html"

    crawler = WebCrawler(max_depth=1, max_pages=10, rate_limit_delay_s=0,
                         fetcher=fetcher)
    results = crawler.crawl("https://site.com/")
    urls = {r.url for r in results}
    assert "https://site.com/a" in urls and "https://site.com/b" in urls
    assert "https://other.com/x" not in urls  # same-domain filter


def test_crawler_single():
    def fetcher(url):
        return "<html><title>T</title><body>hello world</body></html>", "text/html"

    crawler = WebCrawler(fetcher=fetcher, rate_limit_delay_s=0)
    r = crawler.crawl_single("https://x.com/page")
    assert r.text == "hello world"
    assert r.title == "T"


# -- github -----------------------------------------------------------------
def test_github_url_parsing():
    assert is_github_url("https://github.com/owner/repo")
    assert not is_github_url("https://gitlab.com/owner/repo")
    d = parse_github_url("https://github.com/o/r/blob/main/docs/x.md")
    assert d == {"owner": "o", "repo": "r", "ref": "main", "path": "docs/x.md",
                 "kind": "file"}
    d = parse_github_url("https://github.com/o/r")
    assert d["kind"] == "repo"


def test_github_crawl_with_fake_fetcher():
    from radiant_rag_tpu.ingestion.github_crawler import GitHubCrawler

    def fetcher(url):
        if url.endswith("/repos/o/r"):
            return json.dumps({"default_branch": "dev"}).encode()
        if "git/trees" in url:
            return json.dumps({"tree": [
                {"path": "README.md", "type": "blob"},
                {"path": "src/main.py", "type": "blob"},
                {"path": "img/x.png", "type": "blob"},
            ]}).encode()
        return b"file content of " + url.encode()

    crawler = GitHubCrawler(fetcher=fetcher)
    files = crawler.crawl("https://github.com/o/r")
    paths = {f.path for f in files}
    assert paths == {"README.md", "src/main.py"}  # png filtered by extension


# -- json -------------------------------------------------------------------
def test_json_strategy_detection():
    p = StructuredJSONParser()
    assert p.detect_strategy([{"timestamp": 1, "level": "INFO", "message": "x"}]) == "logs"
    assert p.detect_strategy([{"title": "a", "content": "b"}]) == "semantic"
    assert p.detect_strategy([{"a": 1, "b": 2}]) == "records"
    assert p.detect_strategy({"deep": {"nested": 1}}) == "flatten"


def test_json_semantic_parse():
    p = StructuredJSONParser()
    out = p.parse([{"title": "Doc One", "content": "Body text", "views": 5}])
    assert len(out) == 1
    text, meta = out[0]
    assert "Doc One" in text and "Body text" in text
    assert meta["json_strategy"] == "semantic"


def test_jsonl_file(tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"title": "a", "content": "xx"}\n{"title": "b", "content": "yy"}\n')
    out = StructuredJSONParser().parse_file(str(p))
    assert len(out) == 2


class TestPdfStrategy:
    """pdf_strategy routing (reference strategy surface
    `ingestion/processor.py:236-273`): fast = text layer only, hi_res /
    ocr_only force unstructured, auto falls back to OCR only when the text
    layer is empty. Parsers are stubbed — the routing is the contract."""

    def _stub(self, monkeypatch, proc, text_pages, empty, unstructured):
        monkeypatch.setattr(DocumentProcessor, "_parse_pdf_textlayer",
                            lambda self, p: (list(text_pages), empty))
        calls = []

        def fake_unstructured(path, strategy):
            calls.append(strategy)
            return unstructured
        monkeypatch.setattr(DocumentProcessor, "_parse_pdf_unstructured",
                            staticmethod(fake_unstructured))
        return calls

    def test_fast_never_ocrs(self, monkeypatch, tmp_path):
        proc = DocumentProcessor(pdf_strategy="fast")
        calls = self._stub(monkeypatch, proc, [("page text", {"page": 1})], 0,
                           [("ocr text", {})])
        out = proc.parse_file(tmp_path / "x.pdf")
        assert out == [("page text", {"page": 1})]
        assert calls == []

    def test_hi_res_forces_unstructured(self, monkeypatch, tmp_path):
        proc = DocumentProcessor(pdf_strategy="hi_res")
        calls = self._stub(monkeypatch, proc, [("layer", {})], 0,
                           [("hi res text", {"partition_strategy": "hi_res"})])
        out = proc.parse_file(tmp_path / "x.pdf")
        assert out[0][0] == "hi res text"
        assert calls == ["hi_res"]

    def test_hi_res_degrades_without_unstructured(self, monkeypatch, tmp_path):
        proc = DocumentProcessor(pdf_strategy="hi_res")
        self._stub(monkeypatch, proc, [("layer", {"page": 1})], 0, None)
        out = proc.parse_file(tmp_path / "x.pdf")
        assert out == [("layer", {"page": 1})]

    def test_auto_ocr_fallback_on_empty_text_layer(self, monkeypatch, tmp_path):
        proc = DocumentProcessor(pdf_strategy="auto")
        calls = self._stub(monkeypatch, proc, [], 3,
                           [("scanned content", {"partition_strategy": "auto"})])
        out = proc.parse_file(tmp_path / "scan.pdf")
        assert out[0][0] == "scanned content"
        assert calls == ["auto"]

    def test_auto_keeps_text_layer_when_present(self, monkeypatch, tmp_path):
        proc = DocumentProcessor(pdf_strategy="auto")
        calls = self._stub(monkeypatch, proc, [("real text", {"page": 1})], 0,
                           [("should not be used", {})])
        out = proc.parse_file(tmp_path / "x.pdf")
        assert out == [("real text", {"page": 1})]
        assert calls == []
