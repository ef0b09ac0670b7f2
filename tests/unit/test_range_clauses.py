"""Range / match-all clauses executed on the row engine vs oracle."""

import numpy as np

from diagon_tpu.document import (
    Document,
    DoubleDocValuesField,
    DoublePointField,
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
    DoubleRangeQuery,
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


def _build_double(n=150, seed=9):
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.asarray([f"w{i}" for i in range(20)] + ["oil"], dtype=object)
    mem = MemoryIndex()
    prices = []
    for i in range(n):
        price = float(np.round(rng.uniform(0.0, 100.0), 3))
        prices.append(price)
        mem.add_document(
            Document()
            .add(TextField("body", " ".join(rng.choice(vocab, 12))))
            .add(DoubleDocValuesField("price", price))
            .add(DoublePointField("weight", price * 2.5))
        )
    seg = flush_memory_index(mem, "_0")
    return OracleSearcher([seg]), IndexSearcher([seg]), prices


def test_double_range_standalone():
    o, d, prices = _build_double()
    q = DoubleRangeQuery("price", 25.0, 75.0)
    _agree(o, d, q)
    want = sum(1 for p in prices if 25.0 <= p <= 75.0)
    assert d.count(q) == want


def test_double_range_bounds_exclusive():
    """include_lower/include_upper map to the reference's open bounds
    (DoubleRangeQuery.cpp matchesRange)."""
    o, d, prices = _build_double()
    lo = min(prices)
    hi = max(prices)
    q_open = DoubleRangeQuery("price", lo, hi, include_lower=False,
                              include_upper=False)
    _agree(o, d, q_open)
    assert d.count(q_open) == sum(1 for p in prices if lo < p < hi)
    q_closed = DoubleRangeQuery("price", lo, hi)
    assert d.count(q_closed) == len(prices)


def test_double_range_factories():
    o, d, prices = _build_double()
    q_up = DoubleRangeQuery.new_upper_bound_query("price", 50.0)
    _agree(o, d, q_up)
    assert d.count(q_up) == sum(1 for p in prices if p <= 50.0)
    q_lo = DoubleRangeQuery.new_lower_bound_query("price", 50.0, False)
    _agree(o, d, q_lo)
    assert d.count(q_lo) == sum(1 for p in prices if p > 50.0)
    exact = DoubleRangeQuery.new_exact_query("price", prices[7])
    _agree(o, d, exact)
    assert d.count(exact) >= 1


def test_double_range_in_boolean():
    o, d, _ = _build_double()
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(DoubleRangeQuery("price", 10.0, 90.0), Occur.FILTER)
    _agree(o, d, b.build())
    b2 = BooleanQuery.Builder()
    b2.add(TermQuery("body", "oil"), Occur.SHOULD)
    b2.add(DoubleRangeQuery("price", None, 20.0), Occur.SHOULD)
    b2.add(DoubleRangeQuery("price", 99.0, None), Occur.MUST_NOT)
    _agree(o, d, b2.build())


def test_double_point_range():
    """DoublePointField ranges (PointsData.is_double path: float64
    value-sorted columns, the BKD-double role)."""
    o, d, prices = _build_double()
    q = PointRangeQuery("weight", 50.0, 150.0)
    _agree(o, d, q)
    want = sum(1 for p in prices if 50.0 <= p * 2.5 <= 150.0)
    assert d.count(q) == want
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(PointRangeQuery("weight", None, 120.0), Occur.FILTER)
    _agree(o, d, b.build())


def test_double_range_missing_field_and_reopen(tmp_path):
    o, d, _ = _build_double()
    assert d.count(DoubleRangeQuery("nofield", 0.0, 1.0)) == 0
    # durable round-trip preserves the bit pattern exactly
    from diagon_tpu.store import FSDirectory
    from diagon_tpu.store.format import read_segment, write_segment

    mem = MemoryIndex()
    vals = [0.1, -2.5, 3.14159265358979, 1e300, -0.0]
    for i, v in enumerate(vals):
        mem.add_document(
            Document()
            .add(TextField("body", f"d{i} common"))
            .add(DoubleDocValuesField("x", v))
        )
    seg = flush_memory_index(mem, "_0")
    fsd = FSDirectory(str(tmp_path / "idx"))
    write_segment(fsd, seg)
    seg2 = read_segment(fsd, seg.name)
    o2, d2 = OracleSearcher([seg2]), IndexSearcher([seg2])
    q = DoubleRangeQuery("x", -3.0, 3.2)
    _agree(o2, d2, q)
    assert d2.count(q) == 4  # 0.1, -2.5, 3.14..., -0.0
    assert d2.count(DoubleRangeQuery.new_exact_query("x", 1e300)) == 1
