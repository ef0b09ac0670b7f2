"""Range / match-all clauses executed on the row engine vs oracle."""

import numpy as np

from diagon_tpu.document import (
    Document,
    LongPointField,
    NumericDocValuesField,
    SortedNumericDocValuesField,
    TextField,
)
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.search.oracle import OracleSearcher
from diagon_tpu.search.query import (
    BooleanQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    Occur,
    PointRangeQuery,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher


def _build(n=200, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.asarray([f"w{i}" for i in range(30)] + ["oil"], dtype=object)
    mem = MemoryIndex()
    for i in range(n):
        mem.add_document(
            Document()
            .add(TextField("body", " ".join(rng.choice(vocab, 15))))
            .add(NumericDocValuesField("views", int(rng.integers(0, 1000))))
            .add(LongPointField("ts", int(rng.integers(0, 10000))))
        )
    seg = flush_memory_index(mem, "_0")
    return OracleSearcher([seg]), IndexSearcher([seg])


def _agree(o, d, q, k=10):
    want, got = o.search(q, k), d.search(q, k)
    assert want.total_hits == got.total_hits, q
    assert want.doc_ids() == got.doc_ids(), q
    for a, b in zip(want.score_docs, got.score_docs):
        assert a.score == b.score, q
    assert o.count(q) == d.count(q)


def test_term_and_numeric_range_filter():
    o, d = _build()
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(NumericRangeQuery("views", 200, 800), Occur.FILTER)
    _agree(o, d, b.build())


def test_term_or_point_range():
    o, d = _build()
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.SHOULD)
    b.add(PointRangeQuery("ts", 9000, None), Occur.SHOULD)
    _agree(o, d, b.build())


def test_range_must_not():
    o, d = _build()
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(NumericRangeQuery("views", None, 500), Occur.MUST_NOT)
    _agree(o, d, b.build())


def test_match_all_with_filter():
    o, d = _build()
    b = BooleanQuery.Builder()
    b.add(MatchAllDocsQuery(), Occur.MUST)
    b.add(NumericRangeQuery("views", 100, 300), Occur.FILTER)
    b.add(TermQuery("body", "w3"), Occur.SHOULD)
    _agree(o, d, b.build())


def test_scoring_range_must():
    """A MUST range contributes constant score 1.0 like the oracle."""
    o, d = _build()
    b = BooleanQuery.Builder()
    b.add(NumericRangeQuery("views", 0, 999), Occur.MUST)
    b.add(TermQuery("body", "oil"), Occur.MUST)
    _agree(o, d, b.build())


def test_multivalued_numeric_range():
    mem = MemoryIndex()
    for i, vals in enumerate([[5, 100], [7], [200, 300], [1]]):
        doc = Document().add(TextField("body", f"doc {i} common"))
        for v in vals:
            doc.add(SortedNumericDocValuesField("nums", v))
        mem.add_document(doc)
    seg = flush_memory_index(mem, "_0")
    o, d = OracleSearcher([seg]), IndexSearcher([seg])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "common"), Occur.MUST)
    b.add(NumericRangeQuery("nums", 50, 250), Occur.FILTER)
    q = b.build()
    want, got = o.search(q, 10), d.search(q, 10)
    assert want.doc_ids() == got.doc_ids()
    assert sorted(got.doc_ids()) == [0, 2]  # docs with ANY value in range
