"""Regression tests for round-1 advisor findings (ADVICE.md):

1. merge -> rollback -> commit -> reopen must not lose segment files
   (rollback used to leave merge-queued deferred deletes pending).
2. Multi-valued SORTED_NUMERIC/SORTED_SET doc values must survive merges
   (the merger used to ignore the value_start CSR).
3. Deletes that land while a background merge is running must be
   re-applied to the merged segment before the swap.
4. Lock.obtain must be atomic (no check-then-create window) and stale
   locks must be recoverable via force_unlock / force=True.
5. exact_topk must clamp the tile-selection stage when k exceeds the
   number of 128-doc tiles.
"""

import numpy as np
import pytest

from diagon_tpu.document import (
    Document,
    SortedNumericDocValuesField,
    SortedSetDocValuesField,
    StoredField,
    TextField,
)
from diagon_tpu.index.merge import OneMerge, SegmentMerger
from diagon_tpu.index.reader import DirectoryReader
from diagon_tpu.index.writer import IndexWriter, IndexWriterConfig
from diagon_tpu.search.oracle import OracleSearcher
from diagon_tpu.search.query import TermQuery
from diagon_tpu.store import FSDirectory, RAMDirectory
from diagon_tpu.store.lock import Lock, LockObtainFailedError


def _doc(text, doc_id=None):
    d = Document().add(TextField("body", text))
    if doc_id is not None:
        d.add(StoredField("id", doc_id))
    return d


# ---------------------------------------------------------------------------
# 1. merge -> rollback -> commit -> reopen
# ---------------------------------------------------------------------------
def test_merge_rollback_commit_does_not_delete_live_files(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    cfg = IndexWriterConfig(max_buffered_docs=1, merge_scheduler="serial")
    with IndexWriter(d, cfg) as w:
        w.add_document(_doc("oil price", "a"))
        w.add_document(_doc("trade news", "b"))
        w.add_document(_doc("gold surge", "c"))
        w.commit()
        # uncommitted merge queues the source .bnd files for deletion
        w.force_merge(1)
        w.rollback()
        # this commit used to drain the stale pending-delete queue and
        # remove files the restored commit still references
        w.commit()

    r = DirectoryReader.open(d)
    assert r.max_doc() == 3
    got = {r.document(i)["id"] for i in range(3)}
    assert got == {"a", "b", "c"}
    s = OracleSearcher(r.segments_data())
    assert s.search(TermQuery("body", "oil"), 10).total_hits == 1


# ---------------------------------------------------------------------------
# 2. multi-valued doc values merge
# ---------------------------------------------------------------------------
def test_multivalued_docvalues_merge_parity(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    cfg = IndexWriterConfig(max_buffered_docs=2, merge_scheduler="serial")
    with IndexWriter(d, cfg) as w:
        for i in range(4):
            doc = _doc(f"doc number{i}", str(i))
            for v in (i * 10, i * 10 + 1, 5):
                doc.add(SortedNumericDocValuesField("nums", v))
            for t in (f"t{i}", "common"):
                doc.add(SortedSetDocValuesField("tags", t))
            w.add_document(doc)
        w.commit()
        assert w.segment_count == 2
        w.force_merge(1)  # used to raise / silently fail on the CSR
        w.commit()

    r = DirectoryReader.open(d)
    assert len(r.segments_data()) == 1
    seg = r.segments_data()[0]
    dv = seg.doc_values["nums"]
    assert dv.value_start is not None
    for i in range(4):
        # doc order is preserved by the merge (no deletes)
        row = np.where(dv.docs == i)[0]
        assert len(row) == 1
        s, e = int(dv.value_start[row[0]]), int(dv.value_start[row[0] + 1])
        assert sorted(dv.values[s:e].tolist()) == sorted([i * 10, i * 10 + 1, 5])
    sv = seg.doc_values["tags"]
    assert sv.value_start is not None
    for i in range(4):
        row = np.where(sv.docs == i)[0][0]
        s, e = int(sv.value_start[row]), int(sv.value_start[row + 1])
        vals = {sv.ord_values[int(o)] for o in sv.values[s:e]}
        assert vals == {f"t{i}".encode(), b"common"}


def test_multivalued_docvalues_merge_with_deletes(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    cfg = IndexWriterConfig(max_buffered_docs=2, merge_scheduler="serial")
    with IndexWriter(d, cfg) as w:
        for i in range(4):
            doc = _doc(f"tok{i} filler", str(i))
            for v in (i, i + 100):
                doc.add(SortedNumericDocValuesField("nums", v))
            w.add_document(doc)
        w.commit()
        w.delete_documents("body", "tok1")
        w.force_merge(1)
        w.commit()

    r = DirectoryReader.open(d)
    seg = r.segments_data()[0]
    assert seg.num_docs == 3
    dv = seg.doc_values["nums"]
    kept = []
    for row in range(len(dv.docs)):
        s, e = int(dv.value_start[row]), int(dv.value_start[row + 1])
        kept.append(sorted(dv.values[s:e].tolist()))
    assert kept == [[0, 100], [2, 102], [3, 103]]


# ---------------------------------------------------------------------------
# 3. deletes racing a merge
# ---------------------------------------------------------------------------
def test_delete_during_merge_not_resurrected(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    cfg = IndexWriterConfig(max_buffered_docs=2, merge_scheduler="serial")
    w = IndexWriter(d, cfg)
    for i in range(4):
        w.add_document(_doc(f"tok{i} filler", str(i)))
    w.commit()
    assert w.segment_count == 2

    # Interleave deterministically: perform the delete after the merger's
    # live-docs snapshot but before the swap, by hooking SegmentMerger.merge.
    real_merge = SegmentMerger.merge
    state = {"fired": False}

    def hooked(segments, name, live=None):
        out = real_merge(segments, name, live=live)
        if not state["fired"]:
            state["fired"] = True
            # race: delete lands while the merge result is being built
            for seg in w._segments:
                fd = seg.fields.get("body")
                if fd is not None and fd.postings.term_id("tok2") >= 0:
                    w._apply_delete(seg, "body", "tok2")
        return out

    SegmentMerger.merge = staticmethod(hooked)
    try:
        w.force_merge(1)
    finally:
        SegmentMerger.merge = staticmethod(real_merge)
    assert state["fired"]
    w.commit()
    w.close()

    r = DirectoryReader.open(d)
    s = OracleSearcher(r.segments_data())
    assert s.search(TermQuery("body", "tok2"), 10).total_hits == 0
    assert s.search(TermQuery("body", "filler"), 10).total_hits == 3


# ---------------------------------------------------------------------------
# 4. lock atomicity + stale recovery
# ---------------------------------------------------------------------------
def test_lock_atomic_and_stale_recovery(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    lk = Lock.obtain(d)
    with pytest.raises(LockObtainFailedError):
        Lock.obtain(d)
    # crashed holder: file remains, no release() ran
    lk._held = False  # simulate process death without cleanup
    with pytest.raises(LockObtainFailedError):
        Lock.obtain(d)
    lk2 = Lock.obtain(d, force=True)
    lk2.release()
    lk3 = Lock.obtain(d)
    lk3.release()


def test_lock_concurrent_obtain_single_winner():
    import threading

    d = RAMDirectory()
    wins, errs = [], []
    barrier = threading.Barrier(8)

    def go():
        barrier.wait()
        try:
            wins.append(Lock.obtain(d))
        except LockObtainFailedError:
            errs.append(1)

    ts = [threading.Thread(target=go) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1 and len(errs) == 7
    wins[0].release()


# ---------------------------------------------------------------------------
# 5. exact_topk clamp for k > num_tiles
# ---------------------------------------------------------------------------
def test_exact_topk_k_exceeds_tile_count():
    import jax.numpy as jnp

    from diagon_tpu.search.row_engine import exact_topk

    rng = np.random.Generator(np.random.PCG64(3))
    D = 128 * 512  # 65536 docs -> two-stage path, G=512 tiles
    scores = rng.random(D).astype(np.float32)
    k = 600  # > G
    vals, docs = exact_topk(jnp.asarray(scores), k)
    vals, docs = np.asarray(vals), np.asarray(docs)
    order = np.lexsort((np.arange(D), -scores))[:k]
    np.testing.assert_array_equal(docs, order)
    np.testing.assert_array_equal(vals, scores[order])


# ---------------------------------------------------------------------------
# Round-2 ADVICE findings
# ---------------------------------------------------------------------------
# 6. Boolean pruned-batch certificate must escalate (or be provably exact)
#    for zero-score matches: FILTER-only / min_should=0 queries have
#    feasible tiles with tile_upper == 0, and the old 'u_next <= 0' clause
#    certified selection misses as safe (wrong docids, no escalation).
def _bool_corpus(n_docs=1100, seed=7):
    from diagon_tpu.index.memory_index import MemoryIndex
    from diagon_tpu.index.segment import flush_memory_index

    rng = np.random.Generator(np.random.PCG64(seed))
    words = np.asarray([f"w{i}" for i in range(40)], dtype=object)
    mem = MemoryIndex()
    for i in range(n_docs):
        toks = list(rng.choice(words, max(3, int(rng.normal(14, 5)))))
        if i % 3 == 0:
            toks.append("filt")  # ~1/3 of docs across ALL tiles
        if i % 211 == 0:
            toks.append("rarehit")
        mem.add_document(_doc(" ".join(toks)))
    return flush_memory_index(mem, "_advf")


def _force_pruned(searcher, field, b0, approx_min_q=1):
    ctx = searcher._ctx(field)
    for ex in ctx.row_executors:
        if ex is not None:
            ex.prune_min_docs = 0
            ex.prune_solo_min_docs = 0
            ex.prune_B0 = b0
            ex.approx_min_q = approx_min_q
    return ctx


@pytest.mark.parametrize("b0", [2, 4])
def test_filter_only_pruned_batch_parity(b0):
    from diagon_tpu.search.query import BooleanQuery, Occur
    from diagon_tpu.search.searcher import IndexSearcher

    seg = _bool_corpus()
    searcher = IndexSearcher([seg])
    _force_pruned(searcher, "body", b0)
    oracle = OracleSearcher([seg])

    def filt_only(term):
        b = BooleanQuery.Builder()
        b.add(TermQuery("body", term), Occur.FILTER)
        return b.build()

    def filt_should(ft, st):
        b = BooleanQuery.Builder()
        b.add(TermQuery("body", ft), Occur.FILTER)
        b.add(TermQuery("body", st), Occur.SHOULD)
        return b.build()

    queries = [
        filt_only("filt"),  # hundreds of score-0 matches, > B0 tiles
        filt_only("rarehit"),
        filt_should("filt", "rarehit"),  # mixed: a few scored, most 0
        filt_only("w1"),
    ]
    got = searcher.search_batch(queries, 10)
    for q, g in zip(queries, got):
        want = oracle.search(q, 10)
        assert [sd.doc for sd in g.score_docs] == [
            sd.doc for sd in want.score_docs
        ], q
        assert g.total_hits == want.total_hits
        for o, d in zip(want.score_docs, g.score_docs):
            assert o.score == d.score


# 7. dispatch() fallback for un-compactable batches must stay chunked and
#    partition by vocabulary instead of falling back wholesale.
def test_compact_partition_parity():
    from diagon_tpu.observability.metrics import registry
    from diagon_tpu.search.query import BooleanQuery, Occur
    from diagon_tpu.search.searcher import IndexSearcher

    seg = _bool_corpus(n_docs=900, seed=13)
    searcher = IndexSearcher([seg])
    ctx = _force_pruned(searcher, "body", 4)
    for ex in ctx.row_executors:
        if ex is not None:
            # tiny vocabulary cap: any multi-query batch over > 8 unique
            # rows must partition into groups rather than fall back
            ex.COMPACT_MAX_ROWS = 8
            ex.COMPACT_GROUP_BYTES = 8 * 10 * ex.index.num_docs_pad

    def or_q(terms):
        b = BooleanQuery.Builder()
        for t in terms:
            b.add(TermQuery("body", t), Occur.SHOULD)
        return b.build()

    rng = np.random.Generator(np.random.PCG64(5))
    queries = [
        or_q(list(rng.choice([f"w{i}" for i in range(40)], 5, replace=False)))
        for _ in range(24)
    ]
    before = registry.counter("search.compact_partitions").value()
    got = searcher.search_batch(queries, 10)
    assert registry.counter("search.compact_partitions").value() > before
    oracle = OracleSearcher([seg])
    for q, g in zip(queries, got):
        want = oracle.search(q, 10)
        assert [sd.doc for sd in g.score_docs] == [
            sd.doc for sd in want.score_docs
        ], q
        assert g.total_hits == want.total_hits
        for o, d in zip(want.score_docs, g.score_docs):
            assert o.score == d.score


# 8. A single plan whose vocabulary alone exceeds the compact cap must take
#    the (chunked) exhaustive fallback and stay bit-exact.
def test_single_oversized_plan_exhaustive_fallback():
    from diagon_tpu.search.query import BooleanQuery, Occur
    from diagon_tpu.search.searcher import IndexSearcher

    seg = _bool_corpus(n_docs=700, seed=29)
    searcher = IndexSearcher([seg])
    ctx = _force_pruned(searcher, "body", 4)
    for ex in ctx.row_executors:
        if ex is not None:
            ex.COMPACT_MAX_ROWS = 4  # or-10 plan alone exceeds this
            ex.COMPACT_GROUP_BYTES = 4 * 10 * ex.index.num_docs_pad

    def or_q(terms):
        b = BooleanQuery.Builder()
        for t in terms:
            b.add(TermQuery("body", t), Occur.SHOULD)
        return b.build()

    queries = [or_q([f"w{i}" for i in range(10)]) for _ in range(3)] + [
        or_q([f"w{i}" for i in range(10, 20)])
    ]
    got = searcher.search_batch(queries, 10)
    oracle = OracleSearcher([seg])
    for q, g in zip(queries, got):
        want = oracle.search(q, 10)
        assert [sd.doc for sd in g.score_docs] == [
            sd.doc for sd in want.score_docs
        ], q
