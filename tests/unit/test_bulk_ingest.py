"""Bulk ingest (MemoryIndex.add_documents) must equal the per-document
add_document loop exactly: same doc ids, postings, positions, norms,
stored rows, doc values, points. Reference: IndexWriter::addDocuments."""

import numpy as np
import pytest

from diagon_tpu.document.document import (
    Document,
    DoublePointField,
    LongPointField,
    NumericDocValuesField,
    StringField,
    TextField,
)
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index


def _corpus(rng, n=300, unicode_every=0, dup_every=0):
    vocab = [f"w{i}" for i in range(80)] + ["oil", "price"]
    docs = []
    for i in range(n):
        d = Document()
        words = rng.choice(vocab, size=int(rng.integers(3, 30)))
        body = " ".join(words)
        if unicode_every and i % unicode_every == 3:
            body += " café résumé"  # forces the python path
        d.add(TextField("body", body))
        d.add(TextField("title", " ".join(rng.choice(vocab, size=3))))
        if dup_every and i % dup_every == 5:
            d.add(TextField("body", "extra duplicate field text"))
        d.add(StringField("cat", f"c{int(rng.integers(0, 5))}"))
        d.add(NumericDocValuesField("rank", int(rng.integers(0, 1000))))
        d.add(LongPointField("year", int(rng.integers(1980, 2030))))
        if i % 7 == 2:
            d.add(DoublePointField("score", float(rng.random())))
        docs.append(d)
    return docs


def _segments_equal(a, b):
    assert a.num_docs == b.num_docs
    assert set(a.fields) == set(b.fields)
    for name in a.fields:
        fa, fb = a.fields[name], b.fields[name]
        np.testing.assert_array_equal(fa.norms, fb.norms, err_msg=name)
        pa, pb = fa.postings, fb.postings
        assert pa.num_terms == pb.num_terms, name
        np.testing.assert_array_equal(pa.doc_freq, pb.doc_freq)
        np.testing.assert_array_equal(pa.packed, pb.packed, err_msg=name)
        np.testing.assert_array_equal(pa.block_start, pb.block_start)
        pa.ensure_positions()
        pb.ensure_positions()
        if pa.positions is not None or pb.positions is not None:
            np.testing.assert_array_equal(
                pa.positions, pb.positions, err_msg=name
            )
            np.testing.assert_array_equal(pa.pos_start, pb.pos_start)
    assert a.stored == b.stored
    assert set(a.doc_values) == set(b.doc_values)
    for name in a.doc_values:
        da, db = a.doc_values[name], b.doc_values[name]
        np.testing.assert_array_equal(da.docs, db.docs)
        np.testing.assert_array_equal(da.values, db.values)
    assert set(a.points) == set(b.points)
    for name in a.points:
        qa, qb = a.points[name], b.points[name]
        np.testing.assert_array_equal(qa.docs, qb.docs)
        np.testing.assert_array_equal(qa.values, qb.values)
        assert qa.is_double == qb.is_double


@pytest.mark.parametrize("unicode_every,dup_every", [
    (0, 0),     # pure native bulk
    (11, 0),    # python-tokenizer docs split the batch into runs
    (0, 13),    # duplicate-field docs fall back per-doc
    (9, 13),    # both
])
def test_bulk_matches_per_doc(unicode_every, dup_every):
    rng = np.random.default_rng(42)
    docs = _corpus(rng, 300, unicode_every, dup_every)

    m1 = MemoryIndex()
    for d in docs:
        m1.add_document(d)
    seg1 = flush_memory_index(m1, "_a")

    m2 = MemoryIndex()
    first = m2.add_documents(docs)
    assert first == 0
    seg2 = flush_memory_index(m2, "_a")

    _segments_equal(seg1, seg2)


def test_bulk_appends_after_per_doc():
    rng = np.random.default_rng(7)
    docs = _corpus(rng, 60)
    m1, m2 = MemoryIndex(), MemoryIndex()
    for d in docs[:20]:
        m1.add_document(d)
        m2.add_document(d)
    for d in docs[20:]:
        m1.add_document(d)
    assert m2.add_documents(docs[20:]) == 20
    _segments_equal(
        flush_memory_index(m1, "_a"), flush_memory_index(m2, "_a")
    )


def test_writer_add_documents_roundtrip(tmp_path):
    from diagon_tpu.index.reader import DirectoryReader
    from diagon_tpu.index.writer import IndexWriter
    from diagon_tpu.search import IndexSearcher, TermQuery
    from diagon_tpu.store import FSDirectory

    d = FSDirectory(str(tmp_path))
    w = IndexWriter(d)
    docs = [
        Document()
        .add(TextField("body", f"oil price doc{i}"))
        .add(StringField("cat", f"c{i % 3}"))
        for i in range(200)
    ]
    w.add_documents(docs)
    w.commit()
    r = DirectoryReader.open(d)
    s = IndexSearcher(r.leaves())
    assert s.search(TermQuery("body", "oil"), 10).total_hits == 200
    assert s.search(TermQuery("cat", "c1"), 10).total_hits == 67
    w.close()
