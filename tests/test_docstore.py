"""Segmented docstore persistence (index/docstore.py).

Round-1 design rewrote one monolithic jsonl.gz per save; the segmented
design must write only deltas, honor tombstones, compact garbage, and still
load the legacy single-file format."""

import gzip
import json
import os
from pathlib import Path

import numpy as np

from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.index.docstore import DocStore


def _mk(n, prefix="doc"):
    return [StoredDoc(f"{prefix}{i}", f"content of {prefix}{i}", {"i": i})
            for i in range(n)]


def _segments(d):
    return sorted(p.name for p in Path(d).glob("seg-*.jsonl.gz"))


def test_segmented_roundtrip(tmp_path):
    store = DocStore()
    for i, doc in enumerate(_mk(10)):
        store.put(doc, row=i)
    d = str(tmp_path / "docs")
    store.save(d)
    loaded = DocStore.load(d)
    assert len(loaded) == 10
    assert loaded.row_of("doc3") == 3
    assert loaded.get("doc7").content == "content of doc7"


def test_incremental_save_writes_only_delta(tmp_path):
    d = str(tmp_path / "docs")
    store = DocStore()
    for i, doc in enumerate(_mk(100)):
        store.put(doc, row=i)
    store.save(d)
    assert len(_segments(d)) == 1
    # second save with nothing new: no-op (no new segment, same mtimes)
    before = {p: os.path.getmtime(tmp_path / "docs" / p) for p in _segments(d)}
    store.save(d)
    assert {p: os.path.getmtime(tmp_path / "docs" / p) for p in _segments(d)} == before
    # add 5 docs: ONE new small segment containing exactly those 5
    for i, doc in enumerate(_mk(5, "new")):
        store.put(doc, row=100 + i)
    store.save(d)
    segs = _segments(d)
    assert len(segs) == 2
    with gzip.open(tmp_path / "docs" / segs[-1], "rt") as fh:
        recs = [json.loads(l) for l in fh if l.strip()]
    assert {r["doc_id"] for r in recs} == {f"new{i}" for i in range(5)}
    assert len(DocStore.load(d)) == 105


def test_delete_tombstones_survive_reload(tmp_path):
    d = str(tmp_path / "docs")
    store = DocStore()
    for i, doc in enumerate(_mk(10)):
        store.put(doc, row=i)
    store.save(d)
    store.delete("doc4")
    store.save(d)
    loaded = DocStore.load(d)
    assert len(loaded) == 9
    assert loaded.get("doc4") is None
    assert loaded.row_of("doc4") is None


def test_update_latest_generation_wins(tmp_path):
    d = str(tmp_path / "docs")
    store = DocStore()
    for i, doc in enumerate(_mk(10)):
        store.put(doc, row=i)
    store.save(d)
    store.put(StoredDoc("doc2", "rewritten content", {"v": 2}), row=2)
    store.save(d)
    loaded = DocStore.load(d)
    assert loaded.get("doc2").content == "rewritten content"
    assert loaded.get("doc2").meta["v"] == 2


def test_compaction_folds_segments(tmp_path):
    d = str(tmp_path / "docs")
    store = DocStore()
    for i, doc in enumerate(_mk(20)):
        store.put(doc, row=i)
    store.save(d)
    # churn: enough updates to cross the 25% garbage threshold
    for i in range(10):
        store.put(StoredDoc(f"doc{i}", f"v2 of doc{i}", {}), row=i)
    store.save(d)
    assert len(_segments(d)) == 1  # compacted back to one segment
    loaded = DocStore.load(d)
    assert len(loaded) == 20
    assert loaded.get("doc0").content == "v2 of doc0"


def test_clear_then_save_persists_empty(tmp_path):
    d = str(tmp_path / "docs")
    store = DocStore()
    for doc in _mk(5):
        store.put(doc)
    store.save(d)
    store.clear()
    store.save(d)
    assert len(DocStore.load(d)) == 0


def test_legacy_single_file_load(tmp_path):
    legacy = tmp_path / "docs.jsonl.gz"
    with gzip.open(legacy, "wt", encoding="utf-8") as fh:
        for i in range(5):
            fh.write(json.dumps({"doc_id": f"d{i}", "content": f"c{i}",
                                 "meta": {}, "row": i}) + "\n")
    loaded = DocStore.load(str(legacy))
    assert len(loaded) == 5
    assert loaded.row_of("d4") == 4


def test_store_level_migration(tmp_path, rng):
    """TpuVectorStore saved with the legacy layout loads, and re-saving
    migrates to docs/ segments."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore

    d = str(tmp_path / "idx")
    store = TpuVectorStore(dim=16, index_config=IndexConfig(dim=16, initial_capacity=64, data_dir=d))
    store.upsert_batch([(f"text {i}", {}, rng.standard_normal(16)) for i in range(8)])
    store.save(d)
    # fabricate the legacy layout: move segments into one flat file
    loaded = TpuVectorStore.load(d)
    legacy = Path(d) / "docs.jsonl.gz"
    with gzip.open(legacy, "wt", encoding="utf-8") as fh:
        for doc in loaded.docstore:
            fh.write(json.dumps({"doc_id": doc.doc_id, "content": doc.content,
                                 "meta": doc.meta,
                                 "row": loaded.docstore.row_of(doc.doc_id)}) + "\n")
    import shutil
    shutil.rmtree(Path(d) / "docs")
    relo = TpuVectorStore.load(d)
    assert relo.count_documents() == loaded.count_documents()
    relo.save(d)
    assert (Path(d) / "docs").is_dir()
    assert not legacy.exists()
    assert TpuVectorStore.load(d).count_documents() == loaded.count_documents()


def test_delete_then_readd_survives_reload(tmp_path):
    """ADVICE r2 (high): a persisted tombstone must not outlive a re-add.

    delete -> save -> re-ingest same doc -> save -> load: the manifest kept
    the old tombstone while load() applies tombstones after replaying all
    segments, so the resurrected doc vanished on restart (content-hash ids
    make delete/re-add cycles routine)."""
    d = str(tmp_path / "docs")
    store = DocStore()
    for i, doc in enumerate(_mk(5)):
        store.put(doc, row=i)
    store.save(d)
    store.delete("doc2")
    store.save(d)  # tombstone persisted
    assert "doc2" not in {doc.doc_id for doc in DocStore.load(d)}
    store.put(StoredDoc("doc2", "content of doc2", {"i": 2}), row=2)
    store.save(d)  # re-add must supersede the tombstone
    loaded = DocStore.load(d)
    assert loaded.get("doc2") is not None
    assert loaded.row_of("doc2") == 2
    # and the tombstone stays dropped across further incremental saves
    store.put(StoredDoc("docX", "x", {}), row=9)
    store.save(d)
    assert DocStore.load(d).get("doc2") is not None


def test_save_clears_only_snapshotted_delta(tmp_path):
    """ADVICE r2 (low): a put() racing between the segment write and the
    dirty-clear must persist on the NEXT save. Simulated by injecting the
    racing put inside _write_segment."""
    d = str(tmp_path / "docs")
    store = DocStore()
    for i, doc in enumerate(_mk(3)):
        store.put(doc, row=i)
    store.save(d)
    store.put(StoredDoc("early", "e", {}), row=3)

    real_write = DocStore._write_segment

    def racing_write(dd, name, entries):
        store.put(StoredDoc("racer", "r", {}), row=4)  # arrives mid-save
        real_write(dd, name, entries)

    store._write_segment = racing_write
    store.save(d)
    store._write_segment = real_write
    assert "racer" in store._dirty  # not clobbered by the clear
    store.save(d)
    assert DocStore.load(d).get("racer") is not None


def test_id_for_row_locked_accessor():
    store = DocStore()
    store.put(StoredDoc("a", "x", {}), row=7)
    assert store.id_for_row(7) == "a"
    assert store.id_for_row(np.int64(7)) == "a"
    assert store.id_for_row(3) is None
