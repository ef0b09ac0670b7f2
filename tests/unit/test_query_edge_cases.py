"""Query edge cases (reference search/QueryEdgeCasesTest.cpp analogue).

Every case runs both the oracle and the device searcher and must agree.
"""

import numpy as np
import pytest

from diagon_tpu.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.search.oracle import OracleSearcher
from diagon_tpu.search.query import (
    BooleanQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher


def _both(texts):
    mem = MemoryIndex()
    for t in texts:
        mem.add_document(Document().add(TextField("body", t)))
    seg = flush_memory_index(mem, "_0")
    return OracleSearcher([seg]), IndexSearcher([seg])


def _agree(o, d, q, k=10):
    want, got = o.search(q, k), d.search(q, k)
    assert want.total_hits == got.total_hits, q
    assert want.doc_ids() == got.doc_ids(), q
    for a, b in zip(want.score_docs, got.score_docs):
        assert a.score == b.score, q
    assert o.count(q) == d.count(q), q


def test_single_doc_corpus():
    o, d = _both(["lonely document"])
    _agree(o, d, TermQuery("body", "lonely"))
    _agree(o, d, TermQuery("body", "absent"))


def test_all_docs_match():
    o, d = _both(["same same", "same", "same same same"])
    _agree(o, d, TermQuery("body", "same"))


def test_duplicate_clauses():
    o, d = _both(["oil price", "oil", "price"])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.SHOULD)
    b.add(TermQuery("body", "oil"), Occur.SHOULD)  # duplicated clause
    _agree(o, d, b.build())


def test_must_and_must_not_same_term():
    o, d = _both(["oil price", "oil", "price"])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(TermQuery("body", "oil"), Occur.MUST_NOT)
    q = b.build()
    assert o.search(q, 10).total_hits == 0
    assert d.search(q, 10).total_hits == 0


def test_min_should_match_exceeds_clauses():
    o, d = _both(["a b", "a", "b"])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "a"), Occur.SHOULD)
    b.add(TermQuery("body", "b"), Occur.SHOULD)
    b.set_minimum_number_should_match(3)
    q = b.build()
    assert o.search(q, 10).total_hits == 0
    assert d.search(q, 10).total_hits == 0


def test_k_larger_than_corpus():
    o, d = _both(["x y", "x"])
    want = o.search(TermQuery("body", "x"), 100)
    got = d.search(TermQuery("body", "x"), 100)
    assert want.doc_ids() == got.doc_ids()


def test_phrase_single_term():
    o, d = _both(["oil price oil", "price"])
    _agree(o, d, PhraseQuery("body", ["oil"]))


def test_phrase_repeated_word():
    o, d = _both(["very very good", "very good", "good very"])
    _agree(o, d, PhraseQuery("body", ["very", "very"]))


def test_phrase_longer_than_docs():
    o, d = _both(["a b", "b c"])
    q = PhraseQuery("body", ["a", "b", "c", "d", "e"])
    assert o.search(q, 10).total_hits == 0
    assert d.search(q, 10).total_hits == 0


def test_apostrophe_and_numeric_tokens():
    o, d = _both(["don't panic 42", "panic 42 now", "dont panic"])
    _agree(o, d, TermQuery("body", "don't"))
    _agree(o, d, TermQuery("body", "42"))
    _agree(o, d, TermQuery("body", "dont"))


def test_empty_boolean_matches_nothing():
    o, d = _both(["anything"])
    q = BooleanQuery([])
    assert o.search(q, 10).total_hits == 0
    # device falls back for clause-less booleans via _term_clauses -> None
    assert d.search(q, 10).total_hits == 0


def test_pure_must_not_matches_nothing():
    o, d = _both(["oil", "gas"])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST_NOT)
    q = b.build()
    assert o.search(q, 10).total_hits == 0
    assert d.search(q, 10).total_hits == 0


def test_match_all():
    o, d = _both(["a", "b", "c"])
    _agree(o, d, MatchAllDocsQuery())


def test_filter_only_query():
    o, d = _both(["oil price", "oil", "water"])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.FILTER)
    q = b.build()
    want, got = o.search(q, 10), d.search(q, 10)
    assert want.total_hits == got.total_hits == 2
    assert all(sd.score == 0.0 for sd in got.score_docs)


def test_nested_boolean_falls_back():
    o, d = _both(["oil price up", "oil down", "price up"])
    inner = BooleanQuery.Builder()
    inner.add(TermQuery("body", "oil"), Occur.SHOULD)
    inner.add(TermQuery("body", "price"), Occur.SHOULD)
    outer = BooleanQuery.Builder()
    outer.add(inner.build(), Occur.MUST)
    outer.add(TermQuery("body", "up"), Occur.MUST)
    q = outer.build()
    want, got = o.search(q, 10), d.search(q, 10)
    assert want.doc_ids() == got.doc_ids()
    assert want.total_hits == got.total_hits
