"""MemoryIndex + flush tests, including reference norm encoding."""

import numpy as np

from diagon_tpu.document import (
    Document,
    LongPointField,
    NumericDocValuesField,
    StoredField,
    StringField,
    TextField,
)
from diagon_tpu.index.memory_index import MemoryIndex, encode_norm
from diagon_tpu.index.segment import flush_memory_index


def test_encode_norm_reference_values():
    # DocumentsWriterPerThread.cpp:462-484
    assert encode_norm(0) == 127
    assert encode_norm(1) == 127
    assert encode_norm(2) == 89  # int(127/sqrt(2)) = int(89.80) = 89
    assert encode_norm(4) == 63
    assert encode_norm(100) == 12
    assert encode_norm(10000) == 1
    assert encode_norm(1000000) == 0


def test_add_and_flush_basic():
    mem = MemoryIndex()
    mem.add_document(
        Document()
        .add(TextField("body", "oil price rises as oil supply falls"))
        .add(StringField("tag", "energy"))
        .add(NumericDocValuesField("views", 42))
        .add(LongPointField("ts", 1000))
        .add(StoredField("id", "doc0"))
    )
    mem.add_document(
        Document()
        .add(TextField("body", "trade deficit widens"))
        .add(NumericDocValuesField("views", 7))
        .add(LongPointField("ts", 2000))
        .add(StoredField("id", "doc1"))
    )

    seg = flush_memory_index(mem, "_0")
    assert seg.num_docs == 2

    body = seg.fields["body"].postings
    tid = body.term_id("oil")
    assert tid >= 0
    assert body.doc_freq[tid] == 1
    assert body.total_tf[tid] == 2  # "oil" twice in doc 0

    # norms: doc0 body length 7, doc1 length 3
    norms = seg.fields["body"].norms
    assert norms[0] == encode_norm(7)
    assert norms[1] == encode_norm(3)

    # keyword field: untokenized
    tag = seg.fields["tag"].postings
    assert tag.term_id("energy") >= 0

    # doc values + points + stored
    dv = seg.doc_values["views"]
    np.testing.assert_array_equal(dv.docs, [0, 1])
    np.testing.assert_array_equal(dv.values, [42, 7])
    pt = seg.points["ts"]
    np.testing.assert_array_equal(pt.values, [1000, 2000])
    assert seg.stored[0]["id"] == "doc0"
    assert seg.stored[1]["id"] == "doc1"


def test_positions_recorded():
    mem = MemoryIndex()
    mem.add_document(Document().add(TextField("body", "a b a c a")))
    seg = flush_memory_index(mem, "_0")
    pp = seg.fields["body"].postings
    tid = pp.term_id("a")
    b = int(pp.block_start[tid])
    e0 = int(pp.block_entry_start[b])
    s, e = int(pp.pos_start[e0]), int(pp.pos_start[e0 + 1])
    np.testing.assert_array_equal(pp.positions[s:e], [0, 2, 4])


def test_collection_stats():
    mem = MemoryIndex()
    mem.add_document(Document().add(TextField("body", "x y z")))
    mem.add_document(Document().add(TextField("body", "x x")))
    mem.add_document(Document().add(TextField("other", "q")))
    seg = flush_memory_index(mem, "_0")
    pp = seg.fields["body"].postings
    assert pp.sum_total_tf == 5
    assert pp.sum_doc_freq == 4  # x:2 docs, y:1, z:1
    assert pp.doc_count_with_field == 2


def test_empty_flush():
    assert flush_memory_index(MemoryIndex(), "_0") is None


def test_deletes():
    mem = MemoryIndex()
    for i in range(4):
        mem.add_document(Document().add(TextField("body", f"doc {i}")))
    seg = flush_memory_index(mem, "_0")
    assert seg.num_live_docs == 4
    assert seg.delete_document(2)
    assert not seg.delete_document(2)  # already deleted
    assert seg.num_live_docs == 3
