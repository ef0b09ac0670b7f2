"""Columnar layer tests: columns, compression, skip indexes, store
round-trip, device scan kernels vs numpy oracle."""

import numpy as np
import pytest

from diagon_tpu.columnar import (
    CODECS,
    ColumnarTable,
    DeviceTable,
    Float64Column,
    Int64Column,
    StringColumn,
    compress,
    decompress,
    read_table,
    write_table,
)
from diagon_tpu.columnar.table import BloomIndex, MinMaxIndex, hash_bytes64
from diagon_tpu.store import RAMDirectory


def test_numeric_column_ops():
    c = Int64Column([3, 1, 4, 1, 5])
    assert len(c) == 5 and c[2] == 4
    c.insert(9)
    assert len(c) == 6
    f = c.filter(np.array([1, 0, 1, 0, 0, 1], bool))
    np.testing.assert_array_equal(f.values, [3, 4, 9])
    cut = c.cut(1, 3)
    np.testing.assert_array_equal(cut.values, [1, 4, 1])
    assert c.compare_at(0, 1, c) == 1  # 3 > 1


def test_string_column():
    c = StringColumn(["alpha", "b", ""])
    assert len(c) == 3
    assert c[0] == b"alpha" and c[2] == b""
    c.insert("zz")
    assert c[3] == b"zz"
    f = c.filter([True, False, False, True])
    assert f.tolist() == [b"alpha", b"zz"]


@pytest.mark.parametrize("chain", [
    ["none"], ["zlib"], ["lz4"], ["delta"], ["delta", "zlib"],
    ["delta", "lz4"], ["doubledelta"], ["t64"],
    ["delta", "t64", "zlib"],
] + ([["zstd"], ["delta", "zstd"]] if "zstd" in CODECS else []))
def test_codec_chains_int64(chain):
    rng = np.random.Generator(np.random.PCG64(5))
    v = np.cumsum(rng.integers(0, 100, size=1000)).astype(np.int64)
    blob = compress(v.tobytes(), chain)
    out = np.frombuffer(decompress(blob), dtype=np.int64)
    np.testing.assert_array_equal(out, v)


def test_gorilla_floats():
    rng = np.random.Generator(np.random.PCG64(6))
    v = rng.normal(100, 1, size=500)
    blob = compress(v.tobytes(), ["gorilla", "zlib"])
    out = np.frombuffer(decompress(blob), dtype=np.float64)
    np.testing.assert_array_equal(out, v)


def test_compression_actually_compresses():
    v = np.arange(8192, dtype=np.int64)  # perfectly delta-compressible
    blob = compress(v.tobytes(), ["delta", "t64", "zlib"])
    assert len(blob) < len(v.tobytes()) / 20


@pytest.mark.skipif("zstd" not in CODECS, reason="libzstd absent")
def test_zstd_roundtrip_and_ratio():
    """ZSTD codec (ctypes libzstd, reference CompressionCodecs.h:141
    ZSTDCodec): round-trip on adversarial shapes and a ratio sanity check
    — zstd must beat zlib-1 on compressible text-like data."""
    from diagon_tpu.columnar.compression import ZlibCodec, ZstdCodec

    c = ZstdCodec()
    rng = np.random.Generator(np.random.PCG64(9))
    text = (b"the quick brown fox jumps over the lazy dog " * 400)
    cases = [
        b"",
        b"a",
        text,
        bytes(rng.integers(0, 256, 100000, dtype=np.uint8)),
        bytes(8192),
    ]
    for data in cases:
        assert c.decompress(c.compress(data)) == data
    assert len(c.compress(text)) < len(ZlibCodec().compress(text))
    # and through the chain framing
    blob = compress(text, ["zstd"])
    assert decompress(blob) == text


def test_lz4_roundtrip_fuzz():
    """LZ4 block format (native/_native.cpp): round-trip on adversarial
    shapes — empty, tiny, incompressible, highly repetitive (long
    matches + overlapping copies), and 255-run length extensions."""
    from diagon_tpu.columnar.compression import Lz4Codec

    c = Lz4Codec()
    rng = np.random.Generator(np.random.PCG64(7))
    cases = [
        b"",
        b"a",
        b"abcd" * 3,                       # 12 bytes: literal-only zone
        b"x" * 13,                         # shortest matchable input
        b"ab" * 5000,                      # overlap copy, offset 2
        bytes(rng.integers(0, 256, 100000, dtype=np.uint8)),  # random
        bytes(rng.integers(0, 4, 65600, dtype=np.uint8)),     # long runs
        b"z" * 300,                        # match-len 255-extensions
        (b"hello world " * 40)[:300] + bytes(100) + b"hello world ",
    ]
    for data in cases:
        blob = c.compress(data)
        assert c.decompress(blob) == data, f"len={len(data)}"
    # repetitive data must actually shrink
    rep = b"the quick brown fox " * 500
    assert len(c.compress(rep)) < len(rep) / 10


def test_lz4_python_fallback_decodes_native_blocks(monkeypatch):
    """The pure-Python parser must decode native-compressed blocks (and
    the literals-only fallback blocks must decode natively)."""
    import diagon_tpu.native as native_pkg
    from diagon_tpu.columnar.compression import Lz4Codec

    if native_pkg._native is None:
        pytest.skip("native extension unavailable")
    c = Lz4Codec()
    data = b"abcabcabc" * 200 + bytes(range(256)) * 4
    native_blob = c.compress(data)
    monkeypatch.setattr(native_pkg, "_native", None)
    assert c.decompress(native_blob) == data
    py_blob = c.compress(data)  # literals-only form
    monkeypatch.undo()
    assert c.decompress(py_blob) == data


def test_minmax_index():
    v = np.arange(20000, dtype=np.int64)
    mm = MinMaxIndex.build(v, granule_rows=8192)
    assert len(mm.mins) == 3
    np.testing.assert_array_equal(mm.mins, [0, 8192, 16384])
    ok = mm.granules_maybe_in_range(10000, 12000)
    np.testing.assert_array_equal(ok, [False, True, False])
    ok2 = mm.granules_maybe_in_range(None, 5)
    np.testing.assert_array_equal(ok2, [True, False, False])


def test_bloom_index():
    vals = [f"user{i}".encode() for i in range(10000)]
    hashed = np.asarray([hash_bytes64(v) for v in vals], dtype=np.uint64)
    bl = BloomIndex.build(hashed, granule_rows=8192)
    # present value: its granule must say maybe
    assert bl.granules_maybe_contain(hash_bytes64(b"user3"))[0]
    assert bl.granules_maybe_contain(hash_bytes64(b"user9000"))[1]
    # absent value: at least mostly pruned (allow bloom false positives)
    fp = sum(
        bool(bl.granules_maybe_contain(hash_bytes64(f"missing{i}".encode())).any())
        for i in range(50)
    )
    assert fp < 25


def _table(n=20000, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    t = ColumnarTable()
    t.add_column("ts", Int64Column(np.sort(rng.integers(0, 1 << 20, n))))
    t.add_column("price", Float64Column(rng.random(n) * 100))
    t.add_column("group", Int64Column(rng.integers(0, 8, n)), minmax=False)
    t.add_column(
        "name",
        StringColumn([f"item{int(i)}" for i in rng.integers(0, 500, n)]),
        bloom=True,
    )
    return t


def test_table_store_roundtrip():
    t = _table()
    d = RAMDirectory()
    write_table(d, "tbl", t)
    got = read_table(d, "tbl", verify_checksums=True)
    assert got.num_rows == t.num_rows
    np.testing.assert_array_equal(
        got.columns["ts"].values, t.columns["ts"].values
    )
    np.testing.assert_array_equal(
        got.columns["price"].values, t.columns["price"].values
    )
    assert got.columns["name"][5] == t.columns["name"][5]
    np.testing.assert_array_equal(
        got.minmax["ts"].mins, t.minmax["ts"].mins
    )
    np.testing.assert_array_equal(got.bloom["name"].words, t.bloom["name"].words)


def test_device_range_agg_matches_numpy():
    t = _table()
    dt = DeviceTable(t)
    ts = t.columns["ts"].values
    price = t.columns["price"].values

    lo, hi = 100000, 600000
    # host_fast=False: this test pins the DEVICE kernel's semantics
    # (f32 min/max, f32 cross-granule sums); the host BULK path is
    # covered by test_host_fast_agg_* below
    got = dt.range_agg("ts", lo, hi, agg_col="price", host_fast=False)
    mask = (ts >= lo) & (ts <= hi)
    assert got["count"] == int(mask.sum())
    assert got["min"] == np.float32(price[mask].astype(np.float32).min())
    assert got["max"] == np.float32(price[mask].astype(np.float32).max())
    assert abs(got["sum"] - price[mask].sum()) / price[mask].sum() < 1e-3
    # sorted ts -> granule pruning must actually skip granules
    assert got["granules_scanned"] < got["granules_total"]

    empty = dt.range_agg("ts", 1 << 30, None, host_fast=False)
    assert empty["count"] == 0 and empty["min"] is None


def test_host_fast_agg_bulk_resolution():
    """Metadata BULK fast path (reference ColumnarStore.h SKIP/BULK):
    queries decided by granule minmax (+ boundary scans) answer on host,
    exactly, with no device dispatch."""
    t = _table()
    dt = DeviceTable(t)
    ts = t.columns["ts"].values
    price = t.columns["price"].values

    # sorted filter column -> at most 2 boundary granules are partial
    lo, hi = 100000, 600000
    got = dt.host_fast_agg("ts", lo, hi, agg_col="price")
    assert got is not None and got["host_fast_path"]
    mask = (ts >= lo) & (ts <= hi)
    assert got["count"] == int(mask.sum())
    assert got["min"] == price[mask].min()
    assert got["max"] == price[mask].max()
    assert abs(got["sum"] - price[mask].sum(dtype=np.float64)) < 1e-6 * max(
        1.0, abs(price[mask].sum())
    )
    assert got["granules_scanned"] <= 2  # only the boundary granules

    # int agg over int filter: exact int64 sums
    got = dt.host_fast_agg("ts", lo, hi)
    assert got["count"] == int(mask.sum())
    assert got["sum"] == float(ts[mask].sum(dtype=np.int64))

    # empty range below everything
    got = dt.host_fast_agg("ts", -100, -1)
    assert got["count"] == 0 and got["min"] is None and got["sum"] == 0.0

    # full-table range: zero partial granules, pure metadata
    got = dt.host_fast_agg("ts", None, None)
    assert got["granules_scanned"] == 0
    assert got["count"] == t.num_rows
    assert got["min"] == float(ts.min()) and got["max"] == float(ts.max())

    # range above every value: all granules full-out, metadata-only zero
    out = dt.host_fast_agg("price", 200.0, 300.0)
    assert out["count"] == 0 and out["granules_scanned"] == 0

    # unsorted filter column: more partial granules than the cap -> the
    # host path declines and the caller takes the device kernel
    assert dt.host_fast_agg("price", 20.0, 30.0, max_partial=1) is None
    mid = dt.host_fast_agg("price", 20.0, 30.0)  # 3 granules, all partial
    pm = (price >= 20.0) & (price <= 30.0)
    assert mid["count"] == int(pm.sum())
    assert mid["min"] == price[pm].min()

    # and range_agg transparently uses the host path where it applies
    via = dt.range_agg("ts", lo, hi, agg_col="price")
    assert via.get("host_fast_path") is True
    assert via["count"] == int(mask.sum())


def test_device_group_agg_matches_numpy():
    t = _table()
    dt = DeviceTable(t)
    ts = t.columns["ts"].values
    grp = t.columns["group"].values
    price = t.columns["price"].values

    got = dt.range_group_agg("ts", "group", 8, lower=0, upper=500000,
                             agg_col="price")
    mask = (ts >= 0) & (ts <= 500000)
    for g in range(8):
        want = int((mask & (grp == g)).sum())
        assert int(got["group_counts"][g]) == want
        ws = price[mask & (grp == g)].sum()
        if want:
            assert abs(float(got["group_sums"][g]) - ws) / max(ws, 1) < 1e-2


def test_device_string_predicates():
    """Dictionary-encoded strings: equality/range filters, string agg
    min/max, and group-by all run on the device int planes."""
    t = _table()
    dt = DeviceTable(t)
    names = np.array([t.columns["name"][i] for i in range(t.num_rows)],
                     dtype=object)
    ts = t.columns["ts"].values
    price = t.columns["price"].values

    # equality filter
    got = dt.range_agg("name", "item42", "item42", agg_col="price")
    mask = names == b"item42"
    assert got["count"] == int(mask.sum())
    assert got["min"] == np.float32(price[mask].astype(np.float32).min())

    # byte-range filter (dict order == byte order: item10 < item100 < item11)
    got = dt.range_agg("name", "item10", "item19~")
    lo, hi = b"item10", b"item19~"
    mask = (names >= lo) & (names <= hi)
    assert got["count"] == int(mask.sum())

    # absent value -> empty, no error
    assert dt.range_agg("name", "zzz", "zzz")["count"] == 0
    assert dt.range_agg("name", "aaa", "aab")["count"] == 0

    # string aggregate: min/max decode back through the dictionary
    got = dt.range_agg("ts", 0, 200000, agg_col="name")
    mask = ts <= 200000
    assert got["min"] == names[mask].min()
    assert got["max"] == names[mask].max()
    assert got["sum"] is None and got["avg"] is None

    # group-by a string column (num_groups derived from the dictionary)
    g = dt.range_group_agg("ts", "name", lower=0, upper=500000)
    mask = ts <= 500000
    labels = g["group_labels"]
    want = {}
    for nm in names[mask]:
        want[nm] = want.get(nm, 0) + 1
    for li, lab in enumerate(labels):
        assert int(g["group_counts"][li]) == want.get(lab, 0), lab
