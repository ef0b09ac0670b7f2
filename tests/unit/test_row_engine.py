"""Row-bank engine unit tests: bank construction, plan classification,
host rows, dispatch/collect pipelining."""

import numpy as np

from diagon_tpu.bench.queries import REUTERS_QUERIES
from diagon_tpu.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.search.query import BooleanQuery, Occur, TermQuery
from diagon_tpu.search.row_engine import HEAVY_MIN_DF, _bucket_tq
from diagon_tpu.search.searcher import IndexSearcher


def _corpus(n=600, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.asarray(
        ["common"] * 0 + [f"w{i}" for i in range(50)] + ["oil", "price"],
        dtype=object,
    )
    mem = MemoryIndex()
    for i in range(n):
        words = list(rng.choice(vocab, size=20))
        words.append("common")  # df == n -> heavy
        if i % 97 == 0:
            words.append("rareterm")  # df ~ 7 -> light
        mem.add_document(Document().add(TextField("body", " ".join(words))))
    return flush_memory_index(mem, "_0")


def test_bucket_tq():
    assert _bucket_tq(1) == 4
    assert _bucket_tq(5) == 8
    assert _bucket_tq(20) == 20
    assert _bucket_tq(24) == 24
    assert _bucket_tq(25) == 32
    assert _bucket_tq(50) == 64


def test_heavy_light_classification_and_rows():
    seg = _corpus()
    s = IndexSearcher([seg])
    ctx = s._ctx("body")
    ex = ctx.row_executors[0]
    pp = seg.fields["body"].postings
    ridx = ex.index

    common_tid = pp.term_id("common")
    rare_tid = pp.term_id("rareterm")
    # 'common' has df == 600 >= HEAVY_MIN_DF -> heavy bank row
    assert ridx.heavy_row_of_term[common_tid] >= 0
    assert ridx.heavy_row_of_term[rare_tid] == -1

    # host row matches oracle per-doc contribution
    from diagon_tpu.search.oracle import OracleSearcher

    oracle = OracleSearcher([seg])
    scores, mask = oracle._score_dense(seg, TermQuery("body", "rareterm"))
    row = ridx.host_row(rare_tid, s._idf("body", "rareterm", 1.0))
    np.testing.assert_array_equal(row[: seg.num_docs], scores)


def test_plan_pure_or_classification():
    seg = _corpus()
    s = IndexSearcher([seg])
    tc = s._term_clauses(TermQuery("body", "common"))
    plan = s._row_plans("body", tc[1], tc[2])[0]
    assert plan.pure_or

    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "common"), Occur.MUST)
    b.add(TermQuery("body", "oil"), Occur.SHOULD)
    tc = s._term_clauses(b.build())
    plan = s._row_plans("body", tc[1], tc[2])[0]
    assert not plan.pure_or

    b2 = BooleanQuery.Builder()
    b2.add(TermQuery("body", "oil"), Occur.SHOULD)
    b2.add(TermQuery("body", "price"), Occur.SHOULD)
    b2.set_minimum_number_should_match(2)
    tc = s._term_clauses(b2.build())
    plan = s._row_plans("body", tc[1], tc[2])[0]
    assert not plan.pure_or


def test_boosted_clause_uses_host_row():
    seg = _corpus()
    s = IndexSearcher([seg])
    q = TermQuery("body", "common", boost=2.0)
    tc = s._term_clauses(q)
    plan = s._row_plans("body", tc[1], tc[2])[0]
    # boost != 1 cannot use the idf-scaled bank row
    assert plan.hidx[0] == -1 and plan.lidx[0] == 1
    from diagon_tpu.search.oracle import OracleSearcher

    oracle = OracleSearcher([seg])
    otd = oracle.search(q, 5)
    dtd = s.search(q, 5)
    assert otd.doc_ids() == dtd.doc_ids()
    for o, d in zip(otd.score_docs, dtd.score_docs):
        assert o.score == d.score


def test_dispatch_collect_matches_search_batch():
    seg = _corpus()
    s = IndexSearcher([seg])
    queries = [
        TermQuery("body", "common"),
        TermQuery("body", "rareterm"),
    ]
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.SHOULD)
    b.add(TermQuery("body", "price"), Occur.SHOULD)
    queries.append(b.build())

    want = s.search_batch(queries, 10)
    got = s.collect_batch(s.dispatch_batch(queries, 10))
    for w, g in zip(want, got):
        assert w.total_hits == g.total_hits
        assert w.doc_ids() == g.doc_ids()
        assert [sd.score for sd in w.score_docs] == [
            sd.score for sd in g.score_docs
        ]


def test_exact_topk_two_stage():
    """The large-D two-stage path must equal plain top_k semantics
    (score desc, docid asc) including adversarial ties."""
    import jax.numpy as jnp

    from diagon_tpu.search.row_engine import exact_topk

    rng = np.random.Generator(np.random.PCG64(5))
    D = 128 * 512  # 65536 > 32768 -> two-stage path
    k = 10

    def reference(final, k):
        order = np.lexsort((np.arange(len(final)), -final))[:k]
        return final[order], order

    # random scores with heavy ties
    for trial in range(3):
        final = rng.choice(
            np.asarray([-1.0, 0.5, 1.0, 2.0, 2.0, 3.0], np.float32), size=D
        ).astype(np.float32)
        # cluster the global max in one tile to stress the tile selection
        final[1000:1010] = 9.0
        vs, ds = exact_topk(jnp.asarray(final), k)
        ref_v, ref_d = reference(final, k)
        np.testing.assert_array_equal(np.asarray(vs), ref_v)
        np.testing.assert_array_equal(np.asarray(ds), ref_d)


def test_chunked_bank_build_parity(monkeypatch):
    """The heavy bank builds in bounded chunks (10M-doc segments OOM'd
    the unchunked scatter). Force multi-chunk on a small corpus and
    assert the bank equals the single-chunk build bit-for-bit."""
    import numpy as np
    from diagon_tpu.search import row_engine as re_mod
    from diagon_tpu.search.searcher import IndexSearcher
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.query import TermQuery

    seg = _corpus() if "_corpus" in globals() else None
    if seg is None:
        from diagon_tpu.document import Document, TextField
        from diagon_tpu.index.memory_index import MemoryIndex
        from diagon_tpu.index.segment import flush_memory_index

        rng = np.random.Generator(np.random.PCG64(3))
        words = [f"w{i}" for i in range(30)] + ["oil"]
        mem = MemoryIndex()
        for i in range(800):
            toks = rng.choice(np.asarray(words, dtype=object), 25)
            mem.add_document(
                Document().add(TextField("body", " ".join(toks)))
            )
        seg = flush_memory_index(mem, "_cb")

    def real_rows(searcher):
        ridx = searcher._ctx("body").row_executors[0].index
        H = int(ridx.heavy_row_of_term.max()) + 1
        # the flat-scatter path keeps a trailing dump row of scatter
        # junk; only the H real rows are contractual
        return np.asarray(ridx.heavy_bank)[:H]

    s1 = IndexSearcher([seg])
    bank1 = real_rows(s1)

    monkeypatch.setattr(re_mod, "_BANK_BUILD_CHUNK", 2)  # force many chunks
    s2 = IndexSearcher([seg])
    bank2 = real_rows(s2)
    assert bank1.shape == bank2.shape and bank1.shape[0] > 0
    np.testing.assert_array_equal(bank1, bank2)

    # force the ROW-GROUPED build (10M-doc regime: (H+1)*D exceeds the
    # flat i32 scatter limit) and assert the same bank bit-for-bit
    D = bank1.shape[1]
    monkeypatch.setattr(re_mod, "_FLAT_SCATTER_MAX", 3 * D)  # ROWG=2
    s3 = IndexSearcher([seg])
    bank3 = real_rows(s3)
    np.testing.assert_array_equal(bank1, bank3)
    monkeypatch.setattr(re_mod, "_FLAT_SCATTER_MAX", 2**31)

    want = OracleSearcher([seg]).search(TermQuery("body", "oil"), 10)
    got = s2.search(TermQuery("body", "oil"), 10)
    assert got.doc_ids() == want.doc_ids()
    for o, d in zip(want.score_docs, got.score_docs):
        assert o.score == d.score
