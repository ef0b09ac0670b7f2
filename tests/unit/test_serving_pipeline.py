"""Serving-pipeline contract: dispatch_batch/collect_many off-bench.

The bench's throughput numbers assume the dispatch/collect split really
is a pipeline: dispatch_batch must return DEVICE-RESIDENT handles
without forcing a readback, arbitrarily many batches may be in flight,
and collection (in any order, single or stacked) must reproduce the
synchronous search_batch results bit-exactly. Reference role: the
concurrent searcher paths of IndexSearcher (diagon's C++ thread-pool
search), re-expressed as async device dispatch.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from diagon_tpu.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher():
    rng = np.random.Generator(np.random.PCG64(3))
    words = np.asarray(
        [f"w{i}" for i in range(40)] + ["oil", "price", "trade"],
        dtype=object,
    )
    mem = MemoryIndex()
    for _ in range(600):
        ln = max(3, int(rng.normal(18, 6)))
        mem.add_document(
            Document().add(TextField("body", " ".join(rng.choice(words, ln))))
        )
    return IndexSearcher([flush_memory_index(mem, "_pipe")])


def _batches(n):
    outs = []
    for i in range(n):
        outs.append([
            TermQuery("body", f"w{(3 * i) % 40}"),
            BooleanQuery([
                BooleanClause(TermQuery("body", "oil"), Occur.SHOULD),
                BooleanClause(TermQuery("body", f"w{i % 40}"), Occur.SHOULD),
            ]),
            BooleanQuery([
                BooleanClause(TermQuery("body", "trade"), Occur.MUST),
                BooleanClause(TermQuery("body", f"w{(7 * i) % 40}"),
                              Occur.SHOULD),
            ]),
        ])
    return outs


def _assert_same(got, want):
    assert [t.doc_ids() for t in got] == [t.doc_ids() for t in want]
    assert [t.total_hits for t in got] == [t.total_hits for t in want]
    for g, w in zip(got, want):
        for a, b in zip(g.score_docs, w.score_docs):
            assert a.score == b.score


def test_dispatch_returns_device_resident_handles(searcher):
    h = searcher.dispatch_batch(_batches(1)[0], 5)
    nq, k, parts = h
    assert nq == 3 and parts
    for _si, _kk, fused, _ex, _plans in parts:
        # the async contract: no host materialization at dispatch time
        assert isinstance(fused, jax.Array)
        assert not isinstance(fused, np.ndarray)


def test_depth_n_in_flight_then_collect_many(searcher):
    batches = _batches(6)
    want = [searcher.search_batch(b, 5) for b in batches]
    handles = [searcher.dispatch_batch(b, 5) for b in batches]  # all in flight
    got = searcher.collect_many(handles)
    assert len(got) == len(batches)
    for g, w in zip(got, want):
        _assert_same(g, w)


def test_out_of_order_collection(searcher):
    a, b = _batches(2)
    ha = searcher.dispatch_batch(a, 5)
    hb = searcher.dispatch_batch(b, 5)
    got_b = searcher.collect_batch(hb)  # collect LIFO
    got_a = searcher.collect_batch(ha)
    _assert_same(got_b, searcher.search_batch(b, 5))
    _assert_same(got_a, searcher.search_batch(a, 5))


def test_interleaved_dispatch_collect(searcher):
    batches = _batches(4)
    want = [searcher.search_batch(b, 5) for b in batches]
    h0 = searcher.dispatch_batch(batches[0], 5)
    h1 = searcher.dispatch_batch(batches[1], 5)
    _assert_same(searcher.collect_batch(h0), want[0])
    h2 = searcher.dispatch_batch(batches[2], 5)
    _assert_same(searcher.collect_batch(h1), want[1])
    h3 = searcher.dispatch_batch(batches[3], 5)
    got = searcher.collect_many([h2, h3])
    _assert_same(got[0], want[2])
    _assert_same(got[1], want[3])
