"""Oracle searcher tests: hand-computed BM25 + query semantics."""

import numpy as np

from diagon_tpu.document import Document, NumericDocValuesField, TextField, LongPointField
from diagon_tpu.index.memory_index import MemoryIndex, encode_norm
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.search.bm25 import BM25Similarity
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


def _build(docs_text):
    mem = MemoryIndex()
    for t in docs_text:
        mem.add_document(Document().add(TextField("body", t)))
    return flush_memory_index(mem, "_0")


def test_term_query_bm25_exact():
    seg = _build(
        [
            "oil price oil",          # len 3, oil tf 2
            "trade surplus report",   # len 3
            "oil exports",            # len 2, oil tf 1
        ]
    )
    s = OracleSearcher([seg])
    td = s.search(TermQuery("body", "oil"), k=10)
    assert td.total_hits == 2

    # Hand-compute: N=3, df=2 -> idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    idf = np.float32(np.log(np.float32(1.6)))
    # avgdl = sumTotalTermFreq / maxDoc = 8/3
    avgdl = np.float32(8.0) / np.float32(3.0)
    sim = BM25Similarity()
    scorer = sim.scorer(idf, avgdl)

    # doc0: tf=2, len 3 -> norm=int(127/sqrt(3))=73
    n0 = encode_norm(3)
    exp0 = scorer.score(np.float32(2.0), np.array([n0]))[0]
    # doc2: tf=1, len 2 -> norm=int(127/sqrt(2))=89
    n2 = encode_norm(2)
    exp2 = scorer.score(np.float32(1.0), np.array([n2]))[0]

    by_doc = {sd.doc: sd.score for sd in td.score_docs}
    assert by_doc[0] == float(exp0)
    assert by_doc[2] == float(exp2)
    # doc0 (tf 2) outranks doc2
    assert td.score_docs[0].doc == 0


def test_and_query():
    seg = _build(["oil price", "oil", "price oil cheap", "gas price"])
    s = OracleSearcher([seg])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(TermQuery("body", "price"), Occur.MUST)
    td = s.search(b.build(), k=10)
    assert sorted(td.doc_ids()) == [0, 2]


def test_or_query_and_min_should_match():
    seg = _build(["a b", "a", "b", "c"])
    s = OracleSearcher([seg])
    bq = BooleanQuery.Builder()
    bq.add(TermQuery("body", "a"), Occur.SHOULD)
    bq.add(TermQuery("body", "b"), Occur.SHOULD)
    td = s.search(bq.build(), k=10)
    assert sorted(td.doc_ids()) == [0, 1, 2]
    # doc0 matches both -> highest score
    assert td.score_docs[0].doc == 0

    bq2 = BooleanQuery(
        [c for c in bq.build().clauses], minimum_number_should_match=2
    )
    td2 = s.search(bq2, k=10)
    assert td2.doc_ids() == [0]


def test_must_not_and_filter():
    seg = _build(["oil price", "oil gas", "price water"])
    s = OracleSearcher([seg])
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(TermQuery("body", "gas"), Occur.MUST_NOT)
    td = s.search(b.build(), k=10)
    assert td.doc_ids() == [0]

    # With a required (FILTER) clause present, SHOULD becomes optional:
    # doc1 matches the filter with score 0, doc0 adds the SHOULD score.
    b2 = BooleanQuery.Builder()
    b2.add(TermQuery("body", "price"), Occur.SHOULD)
    b2.add(TermQuery("body", "oil"), Occur.FILTER)
    td2 = s.search(b2.build(), k=10)
    assert td2.doc_ids() == [0, 1]
    assert td2.score_docs[1].score == 0.0


def test_phrase_query():
    seg = _build(
        [
            "the oil price rose",       # match at pos 1
            "oil and price",            # no adjacency
            "price oil",                # wrong order
            "big oil price oil price",  # two matches
        ]
    )
    s = OracleSearcher([seg])
    td = s.search(PhraseQuery("body", ["oil", "price"]), k=10)
    assert sorted(td.doc_ids()) == [0, 3]
    # doc3 has phraseFreq 2 but longer doc; check ranking is by BM25
    assert td.total_hits == 2


def test_phrase_trigram():
    seg = _build(["federal reserve bank cut rates", "federal bank reserve"])
    s = OracleSearcher([seg])
    td = s.search(PhraseQuery("body", ["federal", "reserve", "bank"]), k=10)
    assert td.doc_ids() == [0]


def test_match_all_and_ranges():
    mem = MemoryIndex()
    for i, t in enumerate(["a", "b", "c", "d"]):
        mem.add_document(
            Document()
            .add(TextField("body", t))
            .add(NumericDocValuesField("num", i * 10))
            .add(LongPointField("pt", i * 100))
        )
    seg = flush_memory_index(mem, "_0")
    s = OracleSearcher([seg])

    assert s.search(MatchAllDocsQuery(), k=10).total_hits == 4
    td = s.search(NumericRangeQuery("num", lower=10, upper=20), k=10)
    assert sorted(td.doc_ids()) == [1, 2]
    td2 = s.search(PointRangeQuery("pt", lower=150, upper=None), k=10)
    assert sorted(td2.doc_ids()) == [2, 3]


def test_multi_segment_doc_bases():
    seg1 = _build(["oil price", "water"])
    seg2 = _build(["deep oil"])
    s = OracleSearcher([seg1, seg2])
    td = s.search(TermQuery("body", "oil"), k=10)
    assert sorted(td.doc_ids()) == [0, 2]  # second segment doc 0 -> global 2


def test_tie_break_by_doc_id():
    seg = _build(["same text", "same text", "same text"])
    s = OracleSearcher([seg])
    td = s.search(TermQuery("body", "same"), k=2)
    assert td.doc_ids() == [0, 1]
