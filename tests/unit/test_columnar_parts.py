"""MergeTree data parts: Wide/Compact/InMemory round-trips, lifecycle,
merge (reference IMergeTreeDataPart.h:19-140 — stub there, real here)."""

import numpy as np
import pytest

from diagon_tpu.columnar import (
    ColumnarTable,
    DataPartState,
    DataPartType,
    DeviceTable,
    Float64Column,
    Int64Column,
    StringColumn,
    delete_part,
    merge_parts,
    read_part,
    select_part_type,
    write_part,
)
from diagon_tpu.columnar.parts import (
    MAX_COMPACT_BYTES,
    MAX_COMPACT_ROWS,
    table_bytes_estimate,
)
from diagon_tpu.store import RAMDirectory


def make_table(rows=20000, seed=3, strings=True):
    rng = np.random.Generator(np.random.PCG64(seed))
    t = ColumnarTable()
    t.add_column("ts", Int64Column(np.sort(rng.integers(0, 1 << 20, rows))))
    t.add_column("v", Float64Column(rng.random(rows) * 100))
    t.add_column("region", Int64Column(rng.integers(0, 64, rows)), bloom=True)
    if strings:
        t.add_column(
            "tag",
            StringColumn([f"tag{i % 37}" for i in range(rows)]),
            minmax=False,
        )
    return t


def assert_tables_equal(a, b):
    assert set(a.columns) == set(b.columns)
    assert a.num_rows == b.num_rows
    for cname, col in a.columns.items():
        other = b.columns[cname]
        if isinstance(col, StringColumn):
            assert np.array_equal(col.offsets, other.offsets)
            assert np.array_equal(col.chars, other.chars)
        else:
            assert np.array_equal(col.values, other.values)
    assert set(a.minmax) == set(b.minmax)
    for cname in a.minmax:
        assert np.array_equal(a.minmax[cname].mins, b.minmax[cname].mins)
        assert np.array_equal(a.minmax[cname].maxs, b.minmax[cname].maxs)
    assert set(a.bloom) == set(b.bloom)
    for cname in a.bloom:
        assert np.array_equal(a.bloom[cname].words, b.bloom[cname].words)


def test_select_part_type_reference_thresholds():
    assert select_part_type(1, 1) == DataPartType.COMPACT
    assert (
        select_part_type(MAX_COMPACT_BYTES, MAX_COMPACT_ROWS)
        == DataPartType.WIDE
    )
    # reference uses OR: small bytes keeps Compact even at many rows
    assert (
        select_part_type(MAX_COMPACT_BYTES - 1, MAX_COMPACT_ROWS * 10)
        == DataPartType.COMPACT
    )
    assert (
        select_part_type(MAX_COMPACT_BYTES * 10, MAX_COMPACT_ROWS - 1)
        == DataPartType.COMPACT
    )


@pytest.mark.parametrize("ptype", [DataPartType.COMPACT, DataPartType.WIDE])
def test_part_round_trip(ptype):
    t = make_table()
    d = RAMDirectory()
    part = write_part(d, "p_0", t, part_type=ptype)
    assert part.is_active and part.part_type == ptype
    assert part.rows_count == t.num_rows
    assert part.marks_count == t.num_granules
    assert part.bytes_on_disk == sum(d.file_length(f) for f in part.files)
    if ptype == DataPartType.WIDE:
        assert len(part.files) == len(t.columns)  # one bundle per column
    else:
        assert len(part.files) == 1
    got_part, got = read_part(d, "p_0")
    assert got_part.part_type == ptype
    assert got_part.rows_count == t.num_rows
    assert_tables_equal(t, got)


def test_in_memory_part_not_persisted():
    t = make_table(rows=500)
    d = RAMDirectory()
    part = write_part(d, "hot", t, part_type=DataPartType.IN_MEMORY)
    assert part.is_active and part.table is t
    assert d.list_files() == []


def test_auto_type_selection():
    t = make_table(rows=2000)
    d = RAMDirectory()
    assert write_part(d, "small", t).part_type == DataPartType.COMPACT
    # WIDE needs BOTH thresholds crossed (the reference's OR keeps small
    # parts Compact): >=100k rows AND >=10MB
    big = ColumnarTable()
    rows = MAX_COMPACT_ROWS + 8192
    big.add_column("x", Int64Column(np.arange(rows, dtype=np.int64)))
    for j in range(12):
        big.add_column(f"pad{j}", Float64Column(np.zeros(rows)), minmax=False)
    assert table_bytes_estimate(big) >= MAX_COMPACT_BYTES
    assert write_part(d, "big", big).part_type == DataPartType.WIDE


def test_merge_parts_lifecycle_and_equivalence():
    t1 = make_table(rows=9000, seed=1)
    t2 = make_table(rows=11000, seed=2)
    d = RAMDirectory()
    p1 = write_part(d, "p_1", t1, part_type=DataPartType.COMPACT)
    p2 = write_part(d, "p_2", t2, part_type=DataPartType.WIDE)
    merged = merge_parts(d, [p1, p2], "p_merged")
    assert p1.is_obsolete and p2.is_obsolete
    _, got = read_part(d, "p_merged")
    assert got.num_rows == 20000
    for cname in t1.columns:
        a, b = t1.columns[cname], t2.columns[cname]
        g = got.columns[cname]
        if isinstance(a, StringColumn):
            assert g[0] == a[0] and g[9000] == b[0]
            assert g[19999] == b[10999]
        else:
            assert np.array_equal(
                g.values, np.concatenate([a.values, b.values])
            )
    # skip indexes were rebuilt over the merged granule grid
    mm = got.minmax["ts"]
    assert len(mm.mins) == got.num_granules
    # granule 0 of the merged table = first 8192 rows of t1 (ts sorted)
    assert mm.mins[0] == t1.columns["ts"].values[0]
    # granule 1 straddles the t1/t2 seam: index rebuilt, not stitched
    seam = np.concatenate(
        [t1.columns["ts"].values[8192:], t2.columns["ts"].values[: 16384 - 9000]]
    )
    assert mm.mins[1] == seam.min() and mm.maxs[1] == seam.max()
    # and the merged part still scans correctly on device
    dt = DeviceTable(got)
    res = dt.range_agg(filter_col="region", lower=10, upper=20)
    want = sum(
        int(((t.columns["region"].values >= 10)
             & (t.columns["region"].values <= 20)).sum())
        for t in (t1, t2)
    )
    assert res["count"] == want
    # garbage-collect the obsolete sources
    delete_part(d, p1)
    delete_part(d, p2)
    assert p1.state == DataPartState.DELETING
    assert not d.file_exists("p_1.part")
    assert not d.file_exists("p_2.col")
    _, again = read_part(d, "p_merged")
    assert again.num_rows == 20000
