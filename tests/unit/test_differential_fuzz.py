"""Differential fuzzing: random corpora x random boolean queries; the
device searcher must match the oracle bit-for-bit on every draw.

This is the systematic form of the per-family parity tests — random
occur combinations, minShouldMatch values, boosts, duplicate clauses,
missing terms, range clauses, deletes, and multi-segment layouts.
"""

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
    NumericRangeQuery,
    Occur,
    PointRangeQuery,
    TermQuery,
)
from diagon_tpu.search.searcher import IndexSearcher

VOCAB = [f"w{i}" for i in range(60)] + ["oil", "price", "zz_missing_never"]
OCCURS = [Occur.MUST, Occur.SHOULD, Occur.FILTER, Occur.MUST_NOT]


def _random_segments(rng, n_segments):
    segs = []
    for si in range(n_segments):
        mem = MemoryIndex()
        n = int(rng.integers(40, 250))
        for i in range(n):
            ln = int(rng.integers(3, 40))
            words = rng.choice(VOCAB[:-1], size=ln)
            mem.add_document(
                Document()
                .add(TextField("body", " ".join(words)))
                .add(NumericDocValuesField("views", int(rng.integers(0, 100))))
                .add(LongPointField("ts", int(rng.integers(0, 1000))))
            )
        seg = flush_memory_index(mem, f"_f{si}")
        # random deletes
        for d in rng.choice(n, size=n // 10, replace=False):
            seg.delete_document(int(d))
        segs.append(seg)
    return segs


def _random_query(rng):
    b = BooleanQuery.Builder()
    n_clauses = int(rng.integers(1, 7))
    n_should = 0
    n_positive = 0
    for _ in range(n_clauses):
        occ = OCCURS[int(rng.integers(len(OCCURS)))]
        r = rng.random()
        if r < 0.75:
            term = VOCAB[int(rng.integers(len(VOCAB)))]
            boost = float(rng.choice([1.0, 1.0, 1.0, 2.0, 0.5]))
            q = TermQuery("body", term, boost=boost)
        elif r < 0.9:
            lo = int(rng.integers(0, 80))
            q = NumericRangeQuery("views", lo, lo + int(rng.integers(5, 40)))
        else:
            lo = int(rng.integers(0, 800))
            q = PointRangeQuery("ts", lo, lo + int(rng.integers(50, 400)))
        if occ == Occur.SHOULD:
            n_should += 1
        if occ in (Occur.MUST, Occur.SHOULD, Occur.FILTER):
            n_positive += 1
        b.add(q, occ)
    if n_positive == 0:
        b.add(TermQuery("body", "oil"), Occur.SHOULD)
        n_should += 1
    if n_should >= 2 and rng.random() < 0.3:
        b.set_minimum_number_should_match(int(rng.integers(1, n_should + 1)))
    return b.build()


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_differential_random_queries(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    segs = _random_segments(rng, n_segments=int(rng.integers(1, 4)))
    oracle = OracleSearcher(segs)
    device = IndexSearcher(segs)

    for qi in range(25):
        q = _random_query(rng)
        k = int(rng.integers(1, 15))
        want = oracle.search(q, k)
        got = device.search(q, k)
        ctx = f"seed={seed} qi={qi} q={q} k={k}"
        assert got.total_hits == want.total_hits, ctx
        assert got.doc_ids() == want.doc_ids(), ctx
        for a, b in zip(want.score_docs, got.score_docs):
            assert a.score == b.score, ctx
        assert oracle.count(q) == device.count(q), ctx
