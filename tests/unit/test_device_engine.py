"""Device engine vs NumPy oracle parity tests.

The core correctness guarantee: on the same segments, the device searcher
must return the SAME top-k doc ids and bit-identical float32 scores as the
scalar oracle, for every query family.
"""

import numpy as np
import pytest

from diagon_tpu.bench.queries import REUTERS_QUERIES
from diagon_tpu.bench.synthetic import corpus_documents
from diagon_tpu.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.ops.bitpack_ops import decode_doc_blocks
from diagon_tpu.search.oracle import OracleSearcher
from diagon_tpu.search.query import (
    BooleanQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher


def _build_segment(texts, name="_0"):
    mem = MemoryIndex()
    for t in texts:
        mem.add_document(Document().add(TextField("body", t)))
    return flush_memory_index(mem, name)


def _random_texts(rng, n_docs, vocab, mean_len=40):
    texts = []
    for _ in range(n_docs):
        ln = max(1, int(rng.normal(mean_len, mean_len / 3)))
        words = rng.choice(vocab, size=ln)
        texts.append(" ".join(words))
    return texts


VOCAB = np.asarray(
    [f"w{i}" for i in range(200)] + ["oil", "price", "trade", "market"],
    dtype=object,
)


@pytest.fixture(scope="module")
def random_index():
    rng = np.random.Generator(np.random.PCG64(42))
    texts = _random_texts(rng, 700, VOCAB)
    seg = _build_segment(texts)
    return seg, OracleSearcher([seg]), IndexSearcher([seg])


def _assert_same(oracle_td, device_td, check_scores=True):
    assert device_td.total_hits == oracle_td.total_hits
    assert device_td.doc_ids() == oracle_td.doc_ids()
    if check_scores:
        for o, d in zip(oracle_td.score_docs, device_td.score_docs):
            assert o.score == d.score, (o, d)


def test_device_decode_matches_numpy(random_index):
    seg, _, searcher = random_index
    pp = seg.fields["body"].postings
    ds = searcher.device_segments[0]
    f = ds.fields["body"]
    import jax.numpy as jnp

    from diagon_tpu.codecs.postings import decode_block_numpy

    nb = pp.num_blocks
    blocks = jnp.arange(nb, dtype=jnp.int32)
    docids, freqs, valid = decode_doc_blocks(
        f.packed,
        f.block_word_off[blocks],
        f.block_base[blocks],
        f.block_count[blocks],
        f.block_doc_bits[blocks],
        f.block_freq_bits[blocks],
        window_words=f.window_words,
    )
    docids = np.asarray(docids)
    freqs = np.asarray(freqs)
    valid = np.asarray(valid)
    for b in range(nb):
        exp_docs, exp_freqs = decode_block_numpy(pp, b)
        cnt = len(exp_docs)
        np.testing.assert_array_equal(docids[b, :cnt], exp_docs)
        np.testing.assert_array_equal(freqs[b, :cnt], exp_freqs)
        assert valid[b, :cnt].all()
        assert not valid[b, cnt:].any()


def test_term_query_parity(random_index):
    _, oracle, device = random_index
    for term in ["oil", "price", "w0", "w100", "w199"]:
        q = TermQuery("body", term)
        _assert_same(oracle.search(q, 10), device.search(q, 10))
        assert oracle.count(q) == device.count(q)


def test_missing_term(random_index):
    _, oracle, device = random_index
    q = TermQuery("body", "zzz_not_there")
    td = device.search(q, 10)
    assert td.total_hits == 0 and td.score_docs == []


def test_or_query_parity(random_index):
    _, oracle, device = random_index
    for terms in [
        ["oil", "price"],
        ["oil", "trade", "market", "price", "w3"],
        [f"w{i}" for i in range(20)],
        [f"w{i * 7}" for i in range(25)] + ["oil"],
    ]:
        b = BooleanQuery.Builder()
        for t in terms:
            b.add(TermQuery("body", t), Occur.SHOULD)
        q = b.build()
        _assert_same(oracle.search(q, 10), device.search(q, 10))
        assert oracle.count(q) == device.count(q)


def test_and_query_parity(random_index):
    _, oracle, device = random_index
    for terms in [["oil", "price"], ["w1", "w2", "w3"], ["oil", "zzz_missing"]]:
        b = BooleanQuery.Builder()
        for t in terms:
            b.add(TermQuery("body", t), Occur.MUST)
        q = b.build()
        _assert_same(oracle.search(q, 10), device.search(q, 10))
        assert oracle.count(q) == device.count(q)


def test_mixed_boolean_parity(random_index):
    _, oracle, device = random_index
    b = BooleanQuery.Builder()
    b.add(TermQuery("body", "oil"), Occur.MUST)
    b.add(TermQuery("body", "price"), Occur.SHOULD)
    b.add(TermQuery("body", "w5"), Occur.SHOULD)
    b.add(TermQuery("body", "w9"), Occur.MUST_NOT)
    q = b.build()
    _assert_same(oracle.search(q, 10), device.search(q, 10))

    b2 = BooleanQuery.Builder()
    b2.add(TermQuery("body", "oil"), Occur.FILTER)
    b2.add(TermQuery("body", "price"), Occur.SHOULD)
    q2 = b2.build()
    _assert_same(oracle.search(q2, 10), device.search(q2, 10))


def test_min_should_match_parity(random_index):
    _, oracle, device = random_index
    clauses = [
        TermQuery("body", t) for t in ["oil", "price", "trade", "market"]
    ]
    for msm in [1, 2, 3, 4]:
        q = BooleanQuery(
            [type("C", (), {"query": c, "occur": Occur.SHOULD})() for c in clauses],
            minimum_number_should_match=msm,
        )
        # build properly
        b = BooleanQuery.Builder()
        for c in clauses:
            b.add(c, Occur.SHOULD)
        b.set_minimum_number_should_match(msm)
        q = b.build()
        _assert_same(oracle.search(q, 10), device.search(q, 10))
        assert oracle.count(q) == device.count(q)


def test_phrase_parity(random_index):
    _, oracle, device = random_index
    for terms in [["oil", "price"], ["price", "oil"], ["w1", "w2", "w3"]]:
        q = PhraseQuery("body", terms)
        _assert_same(oracle.search(q, 10), device.search(q, 10))


def test_multi_segment_parity():
    rng = np.random.Generator(np.random.PCG64(43))
    segs = [
        _build_segment(_random_texts(rng, n, VOCAB), name=f"_{i}")
        for i, n in enumerate([150, 400, 80])
    ]
    oracle = OracleSearcher(segs)
    device = IndexSearcher(segs)
    for q in [
        TermQuery("body", "oil"),
        PhraseQuery("body", ["oil", "price"]),
    ]:
        _assert_same(oracle.search(q, 10), device.search(q, 10))
    b = BooleanQuery.Builder()
    for t in ["oil", "trade", "w2", "w40"]:
        b.add(TermQuery("body", t), Occur.SHOULD)
    q = b.build()
    _assert_same(oracle.search(q, 10), device.search(q, 10))


def test_deletes_parity():
    rng = np.random.Generator(np.random.PCG64(44))
    seg = _build_segment(_random_texts(rng, 300, VOCAB))
    # delete some docs that match "oil"
    oracle0 = OracleSearcher([seg])
    td = oracle0.search(TermQuery("body", "oil"), 5)
    for d in td.doc_ids()[:3]:
        seg.delete_document(d)
    oracle = OracleSearcher([seg])
    device = IndexSearcher([seg])
    q = TermQuery("body", "oil")
    _assert_same(oracle.search(q, 10), device.search(q, 10))


def test_reuters_synthetic_parity_small():
    """End-to-end parity on a 1.5k-doc slice of the benchmark corpus with
    the real benchmark queries (the full 19k corpus runs in integration)."""
    mem = MemoryIndex()
    for doc in corpus_documents(num_docs=1500):
        mem.add_document(doc)
    seg = flush_memory_index(mem, "_0")
    oracle = OracleSearcher([seg])
    device = IndexSearcher([seg])
    for name, q in REUTERS_QUERIES.items():
        otd = oracle.search(q, 10)
        dtd = device.search(q, 10)
        assert otd.doc_ids() == dtd.doc_ids(), name
        for o, d in zip(otd.score_docs, dtd.score_docs):
            assert o.score == d.score, (name, o, d)
        assert otd.total_hits == dtd.total_hits, name
