"""TieredMergePolicy full behavior (reference TieredMergePolicy.h:33-112
is interface-only; semantics follow its documented Lucene model):
delete-adjusted sizes, floor, allowed-count budget, skew-scored best
merge, max merged size cap, forced-deletes merges."""

import numpy as np

from diagon_tpu.document.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.merge import (
    SegmentMerger,
    TieredMergePolicy,
    segment_size_bytes,
)
from diagon_tpu.index.segment import flush_memory_index


def _seg(n_docs, name, words_per_doc=20, seed=0):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    mem = MemoryIndex()
    for _ in range(n_docs):
        mem.add_document(Document().add(TextField(
            "body", " ".join(rng.choice(vocab, words_per_doc)))))
    return flush_memory_index(mem, name)


def test_within_budget_no_merge():
    p = TieredMergePolicy(segs_per_tier=10, max_merge_at_once=10)
    segs = [_seg(50, f"_{i}", seed=i) for i in range(5)]
    assert p.find_merges(segs).merges == []


def test_over_budget_selects_balanced_merge():
    p = TieredMergePolicy(segs_per_tier=2, max_merge_at_once=4)
    segs = [_seg(50, f"_{i}", seed=i) for i in range(6)]
    spec = p.find_merges(segs)
    assert len(spec.merges) == 1
    members = spec.merges[0].segments
    assert 2 <= len(members) <= 4


def test_max_merged_segment_cap():
    # max cap below 2x a single segment: nothing is eligible
    segs = [_seg(400, f"_{i}", seed=i) for i in range(6)]
    one = segment_size_bytes(segs[0])
    p = TieredMergePolicy(
        segs_per_tier=2, max_merge_at_once=4,
        floor_segment_mb=one / (1024 * 1024) / 4,
        max_merged_segment_mb=one / (1024 * 1024) * 1.5,
    )
    assert p.find_merges(segs).merges == []


def test_delete_adjusted_sizes():
    p = TieredMergePolicy()
    big = _seg(600, "_big")
    full = p._adjusted(big)
    for d in range(540):
        big.delete_document(d)  # 90% deleted
    adj = p._adjusted(big)
    assert abs(adj - 0.1 * full) / full < 0.01
    # a mostly-deleted large segment becomes merge-eligible again: with
    # the cap sized so the FULL segment is oversized but the adjusted
    # one is not, it must appear in the eligible merge set
    small = [_seg(200, f"_s{i}", seed=i) for i in range(12)]
    one = segment_size_bytes(small[0])
    p2 = TieredMergePolicy(
        segs_per_tier=2, max_merge_at_once=4,
        floor_segment_mb=one / (1024 * 1024),
        max_merged_segment_mb=full / (1024 * 1024),
    )
    spec = p2.find_merges([big] + small)
    assert len(spec.merges) == 1
    assert 2 <= len(spec.merges[0].segments) <= 4


def test_forced_deletes_merges():
    p = TieredMergePolicy()
    a = _seg(100, "_a")
    for d in range(30):
        a.delete_document(d)  # 30% deleted
    b = _seg(100, "_b", seed=1)  # clean
    spec = p.find_forced_deletes_merges([a, b])
    assert len(spec.merges) == 1
    assert spec.merges[0].segments == [a]
    merged, _ = SegmentMerger.merge(spec.merges[0].segments, "_m")
    assert merged.num_docs == 70


def test_allowed_count_grows_with_total_size():
    p = TieredMergePolicy(segs_per_tier=4, max_merge_at_once=4)
    tiny = [1.0] * 3
    assert p._allowed_count(tiny) >= 3  # under floor: one tier
    # many floor-sized segments: allowance stays ~segs_per_tier per level
    many = [2.0 * 1024 * 1024] * 40
    allowed = p._allowed_count(many)
    assert 4 <= allowed < 40


# ---- FieldInfos schema drift detection (reference FieldInfosBuilder) ----

def test_field_infos_write_time_drift():
    import pytest

    from diagon_tpu.document.document import (
        Document,
        DoublePointField,
        LongPointField,
        NumericDocValuesField,
        SortedDocValuesField,
    )
    from diagon_tpu.index.field_infos import FieldSchemaError

    mem = MemoryIndex()
    mem.add_document(Document().add(NumericDocValuesField("rank", 5)))
    with pytest.raises(FieldSchemaError):
        mem.add_document(Document().add(SortedDocValuesField("rank", b"x")))

    mem2 = MemoryIndex()
    mem2.add_document(Document().add(LongPointField("year", 1999)))
    with pytest.raises(FieldSchemaError):
        mem2.add_document(Document().add(DoublePointField("year", 2.5)))

    # bulk path sights too
    mem3 = MemoryIndex()
    mem3.add_documents([Document().add(NumericDocValuesField("rank", 5))])
    with pytest.raises(FieldSchemaError):
        mem3.add_documents(
            [Document().add(SortedDocValuesField("rank", b"x"))])


def test_field_infos_merge_time_drift():
    import pytest

    from diagon_tpu.document.document import (
        Document,
        DoublePointField,
        LongPointField,
        TextField,
    )
    from diagon_tpu.index.field_infos import FieldSchemaError

    def seg_with(field, name):
        mem = MemoryIndex()
        mem.add_document(
            Document().add(TextField("body", "oil")).add(field))
        return flush_memory_index(mem, name)

    a = seg_with(LongPointField("year", 1999), "_a")
    b = seg_with(DoublePointField("year", 2.5), "_b")
    with pytest.raises(FieldSchemaError):
        SegmentMerger.merge([a, b], "_m")
    # consistent segments merge fine and carry infos
    c = seg_with(LongPointField("year", 2001), "_c")
    merged, _ = SegmentMerger.merge([a, c], "_m2")
    fi = merged.field_infos.field_info("year")
    assert fi is not None and fi.point_dims == 1 and not fi.point_double


def test_flush_attaches_field_infos():
    seg = _seg(10, "_x")
    assert seg.field_infos is not None
    fi = seg.field_infos.field_info("body")
    assert fi is not None
