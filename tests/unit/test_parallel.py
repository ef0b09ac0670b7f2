"""Sharded search over an 8-device virtual CPU mesh vs single-device oracle."""

import numpy as np
import pytest

from diagon_tpu.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.parallel.sharded import ShardedSearcher, merge_topk
from diagon_tpu.search.oracle import OracleSearcher
from diagon_tpu.search.query import BooleanQuery, Occur, TermQuery


def _texts(rng, n, vocab, mean_len=30):
    out = []
    for _ in range(n):
        ln = max(1, int(rng.normal(mean_len, 8)))
        out.append(" ".join(rng.choice(vocab, size=ln)))
    return out


VOCAB = np.asarray(
    [f"w{i}" for i in range(80)] + ["oil", "price", "trade"], dtype=object
)


def _build_shards(rng, sizes):
    shards = []
    for i, n in enumerate(sizes):
        mem = MemoryIndex()
        for t in _texts(rng, n, VOCAB):
            mem.add_document(Document().add(TextField("body", t)))
        shards.append(flush_memory_index(mem, f"_s{i}"))
    return shards


def test_merge_topk_ordering():
    import jax.numpy as jnp

    scores = jnp.asarray([[1.0, 2.0, 2.0, 0.5, 2.0]])
    docs = jnp.asarray([[7, 9, 3, 1, 5]], dtype=jnp.int32)
    s, d = merge_topk(scores, docs, 4)
    np.testing.assert_array_equal(np.asarray(d[0]), [3, 5, 9, 7])
    np.testing.assert_array_equal(np.asarray(s[0]), [2.0, 2.0, 2.0, 1.0])


@pytest.fixture(scope="module")
def sharded():
    import jax

    rng = np.random.Generator(np.random.PCG64(7))
    n_dev = len(jax.devices())
    assert n_dev >= 2, "tests require the virtual multi-device CPU mesh"
    sizes = [100 + 30 * i for i in range(n_dev)]
    shards = _build_shards(rng, sizes)
    return shards, ShardedSearcher(shards, "body"), OracleSearcher(shards)


def test_sharded_term_query(sharded):
    _, ss, oracle = sharded
    q = TermQuery("body", "oil")
    otd = oracle.search(q, 10)
    std = ss.search(q, 10)
    assert std.total_hits == otd.total_hits
    assert std.doc_ids() == otd.doc_ids()
    for o, d in zip(otd.score_docs, std.score_docs):
        assert o.score == d.score


def test_sharded_boolean_batch(sharded):
    _, ss, oracle = sharded
    queries = []
    b = BooleanQuery.Builder()
    for t in ["oil", "price", "w3", "w10"]:
        b.add(TermQuery("body", t), Occur.SHOULD)
    queries.append(b.build())
    b2 = BooleanQuery.Builder()
    b2.add(TermQuery("body", "oil"), Occur.MUST)
    b2.add(TermQuery("body", "price"), Occur.MUST)
    queries.append(b2.build())
    queries.append(TermQuery("body", "w1"))

    results = ss.search_batch(queries, 10)
    for q, got in zip(queries, results):
        want = oracle.search(q, 10)
        assert got.total_hits == want.total_hits
        assert got.doc_ids() == want.doc_ids()
        for o, d in zip(want.score_docs, got.score_docs):
            assert o.score == d.score


def test_sharded_respects_deletes(sharded):
    shards, _, _ = sharded
    import copy

    from diagon_tpu.parallel.sharded import ShardedSearcher
    from diagon_tpu.search.oracle import OracleSearcher

    shards2 = [copy.deepcopy(s) for s in shards]
    # delete a few docs matching 'oil' in shard 0 and 1
    oracle0 = OracleSearcher(shards2)
    td = oracle0.search(TermQuery("body", "oil"), 6)
    bases = np.cumsum([0] + [s.num_docs for s in shards2])
    for gd in td.doc_ids()[:4]:
        si = int(np.searchsorted(bases, gd, side="right") - 1)
        shards2[si].delete_document(gd - int(bases[si]))

    ss = ShardedSearcher(shards2, "body")
    oracle = OracleSearcher(shards2)
    q = TermQuery("body", "oil")
    want, got = oracle.search(q, 10), ss.search(q, 10)
    assert got.total_hits == want.total_hits
    assert got.doc_ids() == want.doc_ids()


def test_sharded_min_should_match(sharded):
    shards, ss, oracle = sharded
    b = BooleanQuery.Builder()
    for t in ["oil", "price", "trade", "w5"]:
        b.add(TermQuery("body", t), Occur.SHOULD)
    b.set_minimum_number_should_match(2)
    q = b.build()
    want, got = oracle.search(q, 10), ss.search(q, 10)
    assert got.total_hits == want.total_hits
    assert got.doc_ids() == want.doc_ids()
    for a, c in zip(want.score_docs, got.score_docs):
        assert a.score == c.score


def _build_rich_shards(rng, sizes):
    """Shards with positions-bearing phrases, doc values and points."""
    from diagon_tpu.document import LongPointField, NumericDocValuesField

    shards = []
    gid = 0
    for i, n in enumerate(sizes):
        mem = MemoryIndex()
        for t in _texts(rng, n, VOCAB):
            toks = t.split()
            if gid % 9 == 0 and len(toks) > 3:
                toks[1:3] = ["oil", "price"]
            doc = Document().add(TextField("body", " ".join(toks)))
            doc.add(TextField("title", " ".join(toks[:4])))
            doc.add(NumericDocValuesField("year", 1980 + gid % 25))
            doc.add(LongPointField("size", gid * 7 % 3000))
            mem.add_document(doc)
            gid += 1
        shards.append(flush_memory_index(mem, f"_r{i}"))
    return shards


@pytest.fixture(scope="module")
def sharded_rich():
    import jax

    rng = np.random.Generator(np.random.PCG64(21))
    n_dev = len(jax.devices())
    sizes = [90 + 25 * i for i in range(n_dev)]
    shards = _build_rich_shards(rng, sizes)
    return shards, ShardedSearcher(shards, "body"), OracleSearcher(shards)


def test_sharded_phrase_range_nested(sharded_rich):
    """Round-1 gap: phrase / ranges / nested trees / multi-field through
    the sharded path, bit-exact vs the oracle."""
    from diagon_tpu.search.query import (
        MatchAllDocsQuery,
        NumericRangeQuery,
        PhraseQuery,
        PointRangeQuery,
    )

    _, ss, oracle = sharded_rich

    def B(*cl, ms=0):
        b = BooleanQuery.Builder()
        for q, o in cl:
            b.add(q, o)
        b.set_minimum_number_should_match(ms)
        return b.build()

    sub = B((TermQuery("body", "oil"), Occur.SHOULD),
            (TermQuery("body", "price"), Occur.SHOULD))
    queries = [
        PhraseQuery("body", ["oil", "price"]),
        NumericRangeQuery("year", 1985, 1995),
        PointRangeQuery("size", 100, 1500),
        MatchAllDocsQuery(),
        B((PhraseQuery("body", ["oil", "price"]), Occur.MUST),
          (TermQuery("body", "trade"), Occur.SHOULD)),
        B((NumericRangeQuery("year", 1983, 1999), Occur.FILTER),
          (TermQuery("body", "oil"), Occur.SHOULD)),
        B((sub, Occur.MUST), (TermQuery("body", "w3"), Occur.SHOULD)),
        B((sub, Occur.SHOULD), (TermQuery("body", "w7"), Occur.SHOULD)),
        B((TermQuery("body", "oil"), Occur.SHOULD),
          (TermQuery("title", "w2"), Occur.SHOULD)),
        B((TermQuery("body", "trade"), Occur.SHOULD),
          (sub, Occur.MUST_NOT)),
    ]
    results = ss.search_batch(queries, 10)
    for q, got in zip(queries, results):
        want = oracle.search(q, 10)
        assert got.total_hits == want.total_hits, q
        assert got.doc_ids() == want.doc_ids(), q
        for o, d in zip(want.score_docs, got.score_docs):
            assert o.score == d.score, q


def _mixed_batch(n=12):
    """>= approx_min_q distinct queries spanning OR / AND / FILTER-only /
    minShould / MUST_NOT so the sharded PRUNED path sees every boolean
    shape, including score-0 matches (the certificate's hard case)."""
    from diagon_tpu.search.query import PointRangeQuery

    def B(*cl, ms=0):
        b = BooleanQuery.Builder()
        for q, o in cl:
            b.add(q, o)
        b.set_minimum_number_should_match(ms)
        return b.build()

    qs = [
        TermQuery("body", "oil"),
        TermQuery("body", "trade"),
        B((TermQuery("body", "oil"), Occur.SHOULD),
          (TermQuery("body", "price"), Occur.SHOULD),
          (TermQuery("body", "w3"), Occur.SHOULD)),
        B((TermQuery("body", "oil"), Occur.MUST),
          (TermQuery("body", "price"), Occur.MUST)),
        # FILTER-only: every match scores 0 (ADVICE r2 high finding)
        B((TermQuery("body", "oil"), Occur.FILTER)),
        B((PointRangeQuery("size", 100, 1500), Occur.FILTER),
          (TermQuery("body", "trade"), Occur.SHOULD)),
        B((TermQuery("body", "oil"), Occur.SHOULD),
          (TermQuery("body", "price"), Occur.SHOULD),
          (TermQuery("body", "trade"), Occur.SHOULD), ms=2),
        B((TermQuery("body", "trade"), Occur.SHOULD),
          (TermQuery("body", "oil"), Occur.MUST_NOT)),
    ]
    i = 0
    while len(qs) < n:
        qs.append(TermQuery("body", f"w{i}"))
        i += 1
    return qs


def test_sharded_pruned_batch_parity(sharded_rich):
    """Batches >= approx_min_q route through the per-shard pruned
    kernels (_sharded_pruned_search); results stay bit-exact."""
    _, ss, oracle = sharded_rich
    queries = _mixed_batch(12)
    plans = ss._plans(queries)
    assert plans[-1] is not None, "batch should build a sharded compact bank"
    results = ss.search_batch(queries, 10)
    for q, got in zip(queries, results):
        want = oracle.search(q, 10)
        assert got.total_hits == want.total_hits, q
        assert got.doc_ids() == want.doc_ids(), q
        for o, d in zip(want.score_docs, got.score_docs):
            assert o.score == d.score, q


def test_sharded_pruned_escalation(sharded_rich):
    """A starved tile budget forces certificate failures; the in-program
    lax.cond escalation must keep results bit-exact and the escalation
    counter must tick."""
    from diagon_tpu.observability.metrics import registry

    _, ss, oracle = sharded_rich
    queries = _mixed_batch(12)
    before = registry.snapshot().get("search.sharded_escalations", 0)
    ss.prune_B_override = 1
    try:
        results = ss.search_batch(queries, 10)
    finally:
        ss.prune_B_override = 0
    for q, got in zip(queries, results):
        want = oracle.search(q, 10)
        assert got.total_hits == want.total_hits, q
        assert got.doc_ids() == want.doc_ids(), q
        for o, d in zip(want.score_docs, got.score_docs):
            assert o.score == d.score, q
    after = registry.snapshot().get("search.sharded_escalations", 0)
    assert after > before, "B=1 should force at least one escalation"


def test_sharded_pruned_kernel_variants(sharded_rich):
    """The sharded pruned program picks the kernel by batch shape:
    pure-OR batches the 1-product phase 1, no-MUST_NOT boolean batches
    the fused 2-product kernel, negation batches all 4 products —
    bit-exact in every variant."""

    def B(*cl, ms=0):
        b = BooleanQuery.Builder()
        for q, o in cl:
            b.add(q, o)
        b.set_minimum_number_should_match(ms)
        return b.build()

    _, ss, oracle = sharded_rich
    T = lambda t: TermQuery("body", t)

    or_batch = [T("oil"), T("price"), T("trade")] + [
        B((T("oil"), Occur.SHOULD), (T(f"w{i}"), Occur.SHOULD))
        for i in range(9)
    ]
    bool_batch = [
        B((T("oil"), Occur.MUST), (T("price"), Occur.MUST)),
        B((T("trade"), Occur.FILTER), (T("oil"), Occur.SHOULD)),
        B((T("oil"), Occur.MUST), (T("w1"), Occur.SHOULD),
          (T("w2"), Occur.SHOULD)),
    ] * 4
    neg_batch = bool_batch[:10] + [
        B((T("oil"), Occur.SHOULD), (T("w3"), Occur.MUST_NOT)),
    ] * 2

    for batch, want_pure, want_fused in (
        (or_batch, True, False),
        (bool_batch, False, True),
        (neg_batch, False, False),
    ):
        compact = ss._plans(batch)[-1]
        assert compact is not None
        assert compact["pure_or"] is want_pure, (want_pure, want_fused)
        assert compact["fused2"] is want_fused, (want_pure, want_fused)
        for q, got in zip(batch, ss.search_batch(batch, 10)):
            want = oracle.search(q, 10)
            assert got.total_hits == want.total_hits, q
            assert got.doc_ids() == want.doc_ids(), q
            for o, d in zip(want.score_docs, got.score_docs):
                assert o.score == d.score, q
