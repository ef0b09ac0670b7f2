"""Device execution of nested boolean trees, phrase clauses inside
booleans, foreign-field terms, and standalone range / match-all queries —
bit-exact vs the oracle WITHOUT the host fallback (VERDICT round 1:
"_fallback_search unreachable for any query in the fuzz test family")."""

import numpy as np
import pytest

from diagon_tpu.document import (
    Document,
    LongPointField,
    NumericDocValuesField,
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
    PhraseQuery,
    PointRangeQuery,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher


def _corpus(n=700, seed=17):
    rng = np.random.Generator(np.random.PCG64(seed))
    words = [f"w{i}" for i in range(40)] + ["oil", "price", "trade"]
    mem = MemoryIndex()
    for i in range(n):
        toks = list(rng.choice(words, max(4, int(rng.normal(22, 6)))))
        if i % 11 == 0:
            off = int(rng.integers(0, len(toks) - 1))
            toks[off : off + 2] = ["oil", "price"]
        doc = Document().add(TextField("body", " ".join(toks)))
        doc.add(TextField("title", " ".join(rng.choice(words, 5))))
        doc.add(NumericDocValuesField("year", 1980 + int(rng.integers(20))))
        doc.add(LongPointField("size", int(rng.integers(0, 5000))))
        mem.add_document(doc)
    return flush_memory_index(mem, "_n")


def _no_fallback_searcher(seg):
    s = IndexSearcher([seg])

    def boom(query, k=None):
        raise AssertionError(f"fallback reached for {query!r}")

    s._fallback_search = boom
    s._fallback_count = boom
    return s


def _check(s, oracle, q, k=10):
    got = s.search(q, k)
    want = oracle.search(q, k)
    assert got.doc_ids() == want.doc_ids(), q
    assert got.total_hits == want.total_hits, q
    for o, d in zip(want.score_docs, got.score_docs):
        assert o.score == d.score, (q, o, d)
    assert s.count(q) == oracle.count(q), q


def B(*cl, ms=0):
    b = BooleanQuery.Builder()
    for q, o in cl:
        b.add(q, o)
    b.set_minimum_number_should_match(ms)
    return b.build()


def T(t, f="body", boost=1.0):
    return TermQuery(f, t, boost)


def test_standalone_ranges_and_matchall_on_device():
    seg = _corpus()
    s = _no_fallback_searcher(seg)
    oracle = OracleSearcher([seg])
    _check(s, oracle, NumericRangeQuery("year", 1985, 1990))
    _check(s, oracle, PointRangeQuery("size", None, 800))
    _check(s, oracle, MatchAllDocsQuery(), k=25)


def test_nested_boolean_trees_on_device():
    seg = _corpus()
    s = _no_fallback_searcher(seg)
    oracle = OracleSearcher([seg])

    sub = B((T("oil"), Occur.SHOULD), (T("price"), Occur.SHOULD))
    _check(s, oracle, B((sub, Occur.MUST), (T("trade"), Occur.SHOULD)))
    _check(s, oracle, B((sub, Occur.SHOULD), (T("w3"), Occur.SHOULD)))
    _check(s, oracle, B((T("trade"), Occur.SHOULD), (sub, Occur.MUST_NOT)))
    _check(s, oracle, B((T("trade"), Occur.SHOULD), (sub, Occur.FILTER)))

    # filter-only subtree: matches carry score 0 (the A/B split case)
    fsub = B((NumericRangeQuery("year", 1983, 1987), Occur.FILTER),
             (T("oil"), Occur.FILTER))
    _check(s, oracle, B((fsub, Occur.SHOULD), (T("w5"), Occur.SHOULD)))
    _check(s, oracle, B((fsub, Occur.MUST), (T("w5"), Occur.SHOULD)))

    # three levels deep
    deep = B((B((sub, Occur.MUST), (T("w1"), Occur.SHOULD)), Occur.SHOULD),
             (T("w2"), Occur.SHOULD))
    _check(s, oracle, deep)


def test_phrase_and_foreign_field_clauses_on_device():
    seg = _corpus()
    s = _no_fallback_searcher(seg)
    oracle = OracleSearcher([seg])

    ph = PhraseQuery("body", ["oil", "price"])
    _check(s, oracle, B((ph, Occur.SHOULD), (T("trade"), Occur.SHOULD)))
    _check(s, oracle, B((ph, Occur.MUST), (T("w1"), Occur.SHOULD)))
    _check(s, oracle, B((T("trade"), Occur.SHOULD), (ph, Occur.MUST_NOT)))

    # terms from two different fields in one boolean
    _check(s, oracle, B((T("oil"), Occur.SHOULD),
                        (T("w2", f="title"), Occur.SHOULD)))
    _check(s, oracle, B((T("oil"), Occur.MUST),
                        (T("w2", f="title"), Occur.MUST)))


def test_boosted_term_cache_keys_distinct():
    seg = _corpus()
    s = _no_fallback_searcher(seg)
    oracle = OracleSearcher([seg])
    q1 = B((T("oil"), Occur.SHOULD), (T("price", boost=2.0), Occur.SHOULD))
    q2 = B((T("oil"), Occur.SHOULD), (T("price"), Occur.SHOULD))
    _check(s, oracle, q1)
    _check(s, oracle, q2)
    assert repr(q1) != repr(q2)


def test_nested_fuzz():
    rng = np.random.Generator(np.random.PCG64(99))
    seg = _corpus(n=500, seed=23)
    s = _no_fallback_searcher(seg)
    oracle = OracleSearcher([seg])
    vocab = [f"w{i}" for i in range(40)] + ["oil", "price", "trade", "zz"]
    occurs = [Occur.MUST, Occur.SHOULD, Occur.FILTER, Occur.MUST_NOT]

    def rand_leaf():
        r = rng.random()
        if r < 0.55:
            return TermQuery("body", str(rng.choice(vocab)))
        if r < 0.7:
            return NumericRangeQuery(
                "year", 1980 + int(rng.integers(10)),
                1985 + int(rng.integers(15)),
            )
        if r < 0.8:
            return PointRangeQuery("size", int(rng.integers(2000)), None)
        if r < 0.9:
            return PhraseQuery("body", ["oil", "price"])
        return TermQuery("title", str(rng.choice(vocab)))

    def rand_tree(depth):
        n = int(rng.integers(2, 5))
        b = BooleanQuery.Builder()
        n_should = 0
        for _ in range(n):
            q = (
                rand_tree(depth - 1)
                if depth > 0 and rng.random() < 0.3
                else rand_leaf()
            )
            o = occurs[int(rng.integers(4))]
            if o == Occur.SHOULD:
                n_should += 1
            b.add(q, o)
        if n_should and rng.random() < 0.3:
            b.set_minimum_number_should_match(int(rng.integers(1, n_should + 1)))
        return b.build()

    checked = 0
    for _ in range(40):
        q = rand_tree(2)
        tc = s._term_clauses(q)
        if tc is None:  # pure MUST_NOT trees legitimately fall out
            continue
        _check(s, oracle, q, k=int(rng.integers(1, 15)))
        checked += 1
    assert checked >= 25
