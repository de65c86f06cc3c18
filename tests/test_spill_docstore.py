"""Out-of-core docstore (index/docstore.SpillDocStore) — VERDICT r3 #5b.

Content must live on disk with only an id->(segment,offset) index + LRU in
RAM; save() persists O(new docs) index deltas; load() never reads content
bytes; flipping `index.docstore: spill` on an existing in-RAM deployment
migrates once."""

import json
from pathlib import Path

import numpy as np
import pytest

from radiant_rag_tpu.config import IndexConfig
from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.index.docstore import DocStore, SpillDocStore, load_docstore


def _mk(n, prefix="doc"):
    return [StoredDoc(f"{prefix}{i}", f"content of {prefix}{i}", {"i": i})
            for i in range(n)]


def test_put_get_roundtrip_and_len(tmp_path):
    s = SpillDocStore(str(tmp_path / "spill"))
    for i, doc in enumerate(_mk(20)):
        s.put(doc, row=i)
    assert len(s) == 20
    assert s.get("doc7").content == "content of doc7"
    assert s.get("doc7").meta == {"i": 7}
    assert s.row_of("doc3") == 3
    assert s.id_for_row(3) == "doc3"
    assert s.get("missing") is None


def test_content_not_in_ram(tmp_path):
    """With a 2-doc LRU, older docs must be served from disk, not memory."""
    s = SpillDocStore(str(tmp_path / "spill"), cache_docs=2)
    for i, doc in enumerate(_mk(10)):
        s.put(doc, row=i)
    s.save()
    assert len(s._cache) == 2
    doc = s.get("doc0")  # evicted long ago -> disk fetch
    assert doc.content == "content of doc0"
    assert "doc0" in s._cache  # fetched docs become hot


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path / "spill")
    s = SpillDocStore(d)
    for i, doc in enumerate(_mk(15)):
        s.put(doc, row=i)
    s.save()
    s2 = SpillDocStore.load(d)
    assert len(s2) == 15
    assert s2.get("doc11").content == "content of doc11"
    assert s2.row_of("doc11") == 11
    assert s2.id_for_row(14) == "doc14"


def test_incremental_save_is_delta(tmp_path):
    d = tmp_path / "spill"
    s = SpillDocStore(str(d))
    for i, doc in enumerate(_mk(50)):
        s.put(doc, row=i)
    s.save()
    idx1 = sorted(p.name for p in d.glob("idx-*.jsonl.gz"))
    s.put(StoredDoc("extra", "late arrival", {}), row=50)
    s.save()
    idx2 = sorted(p.name for p in d.glob("idx-*.jsonl.gz"))
    new = set(idx2) - set(idx1)
    assert len(new) == 1
    import gzip

    with gzip.open(d / new.pop(), "rt") as fh:
        lines = [json.loads(x) for x in fh]
    assert [r["doc_id"] for r in lines] == ["extra"]


def test_unchanged_save_is_noop(tmp_path):
    d = tmp_path / "spill"
    s = SpillDocStore(str(d))
    for i, doc in enumerate(_mk(5)):
        s.put(doc, row=i)
    s.save()
    before = sorted(p.name for p in d.iterdir())
    s.save()
    assert sorted(p.name for p in d.iterdir()) == before


def test_delete_tombstone_survives_reload(tmp_path):
    d = str(tmp_path / "spill")
    s = SpillDocStore(d)
    for i, doc in enumerate(_mk(6)):
        s.put(doc, row=i)
    s.save()
    assert s.delete("doc2") == 2
    s.save()
    s2 = SpillDocStore.load(d)
    assert len(s2) == 5
    assert s2.get("doc2") is None
    assert s2.row_of("doc2") is None


def test_update_latest_generation_wins_after_reload(tmp_path):
    d = str(tmp_path / "spill")
    s = SpillDocStore(d)
    s.put(StoredDoc("a", "v1", {}), row=0)
    s.save()
    s.put(StoredDoc("a", "v2", {}), row=0)
    s.save()
    s2 = SpillDocStore.load(d)
    assert s2.get("a").content == "v2"
    assert len(s2) == 1


def test_compaction_reclaims_disk(tmp_path):
    d = tmp_path / "spill"
    s = SpillDocStore(str(d))
    for i, doc in enumerate(_mk(30)):
        s.put(doc, row=i)
    # rewrite everything several times -> >25% garbage triggers compaction
    for gen in range(4):
        for i in range(30):
            s.put(StoredDoc(f"doc{i}", f"gen{gen} doc{i}", {}), row=i)
        s.save()
    content = list(d.glob("content-*.jsonl"))
    total = sum(p.stat().st_size for p in content)
    # live data is ~30 short records; compaction must have dropped the rest
    assert total < 4 * 30 * 120
    s2 = SpillDocStore.load(str(d))
    assert len(s2) == 30
    assert s2.get("doc5").content == "gen3 doc5"


def test_iter_streams_all_docs(tmp_path):
    s = SpillDocStore(str(tmp_path / "spill"), cache_docs=3)
    for i, doc in enumerate(_mk(25)):
        s.put(doc, row=i)
    seen = {d.doc_id for d in s}
    assert seen == {f"doc{i}" for i in range(25)}


def test_docs_view_supports_keys(tmp_path):
    s = SpillDocStore(str(tmp_path / "spill"))
    for i, doc in enumerate(_mk(4)):
        s.put(doc, row=i)
    assert sorted(s.docs.keys()) == ["doc0", "doc1", "doc2", "doc3"]
    assert "doc2" in s.docs
    assert len(s.docs) == 4
    assert s.docs["doc1"].content == "content of doc1"
    with pytest.raises(KeyError):
        s.docs["nope"]


def test_clear_empties_disk_and_ram(tmp_path):
    d = tmp_path / "spill"
    s = SpillDocStore(str(d))
    for i, doc in enumerate(_mk(8)):
        s.put(doc, row=i)
    s.save()
    s.clear()
    assert len(s) == 0
    assert not list(d.glob("content-*.jsonl"))
    s.put(StoredDoc("fresh", "after clear", {}), row=0)
    s.save()
    s2 = SpillDocStore.load(str(d))
    assert len(s2) == 1 and s2.get("fresh").content == "after clear"


def test_load_never_reads_content_bytes(tmp_path, monkeypatch):
    d = str(tmp_path / "spill")
    s = SpillDocStore(d)
    for i, doc in enumerate(_mk(10)):
        s.put(doc, row=i)
    s.save()
    called = []
    orig = SpillDocStore._read_record

    def spy(self, *a):
        called.append(a)
        return orig(self, *a)

    monkeypatch.setattr(SpillDocStore, "_read_record", spy)
    s2 = SpillDocStore.load(d)
    assert len(s2) == 10
    assert called == []  # restart cost is O(index)
    assert s2.get("doc1").content == "content of doc1"
    assert len(called) == 1


def test_migration_from_memory_format(tmp_path):
    base = tmp_path / "index"
    base.mkdir()
    mem = DocStore()
    for i, doc in enumerate(_mk(12)):
        mem.put(doc, row=i)
    mem.save(str(base / "docs"))
    migrated = load_docstore(str(base), prefer="spill")
    assert isinstance(migrated, SpillDocStore)
    assert len(migrated) == 12
    assert migrated.row_of("doc4") == 4
    # second open finds the spill dir directly (no re-migration)
    again = load_docstore(str(base), prefer="spill")
    assert isinstance(again, SpillDocStore)
    assert len(again) == 12
    # without the preference the spill dir still wins (it is the fresher form)
    assert isinstance(load_docstore(str(base)), SpillDocStore)


def test_store_level_spill_roundtrip(tmp_path, rng=None):
    from radiant_rag_tpu.index.store import TpuVectorStore

    rng = np.random.default_rng(0)
    data_dir = str(tmp_path / "idx")
    cfg = IndexConfig(dim=32, initial_capacity=64, data_dir=data_dir,
                      docstore="spill", docstore_cache_docs=4)
    store = TpuVectorStore(dim=32, index_config=cfg)
    assert isinstance(store.docstore, SpillDocStore)
    embs = rng.standard_normal((10, 32)).astype(np.float32)
    store.upsert_batch([(f"text number {i}", {"i": i}, embs[i])
                        for i in range(10)])
    store.save(data_dir)
    loaded = TpuVectorStore.load(data_dir, index_config=cfg)
    assert isinstance(loaded.docstore, SpillDocStore)
    assert loaded.count_documents() == 10
    res = loaded.retrieve_by_embedding(embs[3], top_k=1)
    assert res and res[0][0].content == "text number 3"


def test_store_export_to_foreign_dir_is_portable(tmp_path):
    from radiant_rag_tpu.index.store import TpuVectorStore

    rng = np.random.default_rng(1)
    data_dir = str(tmp_path / "idx")
    cfg = IndexConfig(dim=32, initial_capacity=64, data_dir=data_dir,
                      docstore="spill")
    store = TpuVectorStore(dim=32, index_config=cfg)
    embs = rng.standard_normal((5, 32)).astype(np.float32)
    store.upsert_batch([(f"chunk {i}", {}, embs[i]) for i in range(5)])
    foreign = str(tmp_path / "export")
    store.save(foreign)
    # foreign dir holds the portable in-RAM format; loads with default config
    loaded = TpuVectorStore.load(foreign)
    assert loaded.count_documents() == 5
    assert isinstance(loaded.docstore, DocStore)
