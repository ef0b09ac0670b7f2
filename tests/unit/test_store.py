"""Store layer tests: bundle round-trip, directories, locks."""

import numpy as np
import pytest

from diagon_tpu.document import (
    Document,
    LongPointField,
    NumericDocValuesField,
    SortedDocValuesField,
    StoredField,
    StringField,
    TextField,
)
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.store import (
    ArrayBundleReader,
    ArrayBundleWriter,
    FSDirectory,
    LockObtainFailedError,
    RAMDirectory,
    read_segment,
    write_segment,
)


def test_bundle_roundtrip():
    w = ArrayBundleWriter({"hello": 1})
    a = np.arange(100, dtype=np.int32)
    b = np.random.rand(7, 3).astype(np.float32)
    c = np.array([], dtype=np.uint32)
    w.add("a", a)
    w.add("b", b)
    w.add("c", c)
    data = w.tobytes()

    r = ArrayBundleReader(
        np.frombuffer(data, dtype=np.uint8), verify_checksums=True
    )
    assert r.meta == {"hello": 1}
    np.testing.assert_array_equal(r.array("a"), a)
    np.testing.assert_array_equal(r.array("b"), b)
    assert r.array("c").shape == (0,)
    assert r.names() == ["a", "b", "c"]


def test_bundle_detects_corruption():
    w = ArrayBundleWriter()
    w.add("x", np.arange(64, dtype=np.int64))
    data = bytearray(w.tobytes())
    data[-30] ^= 0xFF  # flip a bit in the data section
    with pytest.raises(IOError):
        ArrayBundleReader(
            np.frombuffer(bytes(data), np.uint8), verify_checksums=True
        )


def test_fs_directory(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    d.write_bytes("a.bin", b"hello")
    assert d.read_bytes("a.bin") == b"hello"
    assert d.file_length("a.bin") == 5
    assert d.list_files() == ["a.bin"]
    mm = d.open_mmap("a.bin")
    assert bytes(mm) == b"hello"
    d.rename("a.bin", "b.bin")
    assert d.list_files() == ["b.bin"]
    d.delete_file("b.bin")
    assert d.list_files() == []
    with pytest.raises(ValueError):
        d.write_bytes("../evil", b"x")


def test_lock(tmp_path):
    d = FSDirectory(tmp_path / "idx")
    lock = d.obtain_lock()
    with pytest.raises(LockObtainFailedError):
        d.obtain_lock()
    lock.release()
    d.obtain_lock().release()


def _rich_segment():
    mem = MemoryIndex()
    mem.add_document(
        Document()
        .add(TextField("body", "oil price rises on oil news"))
        .add(StringField("tag", "energy"))
        .add(NumericDocValuesField("views", 42))
        .add(SortedDocValuesField("cat", "a"))
        .add(LongPointField("ts", 100))
        .add(StoredField("id", "d0"))
    )
    mem.add_document(
        Document()
        .add(TextField("body", "trade deficit data"))
        .add(NumericDocValuesField("views", 7))
        .add(SortedDocValuesField("cat", "b"))
        .add(LongPointField("ts", 200))
        .add(StoredField("id", "d1"))
    )
    return flush_memory_index(mem, "_0")


@pytest.mark.parametrize("dir_kind", ["fs", "ram"])
def test_segment_roundtrip(tmp_path, dir_kind):
    d = FSDirectory(tmp_path / "idx") if dir_kind == "fs" else RAMDirectory()
    seg = _rich_segment()
    seg.delete_document(1)
    files = write_segment(d, seg)
    assert f"{seg.name}.bnd" in files and f"{seg.name}.liv" in files

    got = read_segment(d, seg.name, verify_checksums=True)
    assert got.num_docs == seg.num_docs
    assert got.num_live_docs == 1

    # postings identical
    from diagon_tpu.codecs.postings import decode_block_numpy

    for fname in seg.fields:
        a, b = seg.fields[fname].postings, got.fields[fname].postings
        assert a.terms == b.terms
        np.testing.assert_array_equal(a.packed, b.packed)
        np.testing.assert_array_equal(a.block_base, b.block_base)
        np.testing.assert_array_equal(
            seg.fields[fname].norms, got.fields[fname].norms
        )
        assert a.sum_total_tf == b.sum_total_tf
        for blk in range(a.num_blocks):
            da, fa = decode_block_numpy(a, blk)
            db, fb = decode_block_numpy(b, blk)
            np.testing.assert_array_equal(da, db)
            np.testing.assert_array_equal(fa, fb)

    # positions (decoded lazily on read — force them first)
    got.fields["body"].postings.ensure_positions()
    np.testing.assert_array_equal(
        seg.fields["body"].postings.positions,
        got.fields["body"].postings.positions,
    )
    np.testing.assert_array_equal(
        seg.fields["body"].postings.pos_start,
        got.fields["body"].postings.pos_start,
    )
    # doc values incl ords
    np.testing.assert_array_equal(
        got.doc_values["views"].values, [42, 7]
    )
    assert got.doc_values["cat"].ord_values == [b"a", b"b"]
    # points / stored
    np.testing.assert_array_equal(got.points["ts"].values, [100, 200])
    assert got.stored[1]["id"] == "d1"


def test_search_on_reloaded_segment(tmp_path):
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.query import TermQuery

    d = FSDirectory(tmp_path / "idx")
    seg = _rich_segment()
    write_segment(d, seg)
    got = read_segment(d, seg.name)
    td = OracleSearcher([got]).search(TermQuery("body", "oil"), 10)
    assert td.doc_ids() == [0]


def test_codec_registry():
    from diagon_tpu.codecs.registry import (
        Codec,
        available_codecs,
        for_name,
    )

    assert "DiagonTPU1" in available_codecs()
    c = for_name("DiagonTPU1")
    assert c.name == "DiagonTPU1"
    try:
        for_name("NoSuchCodec")
        assert False
    except ValueError:
        pass

    # bundles record their codec
    from diagon_tpu.store import RAMDirectory, write_segment
    from diagon_tpu.store.format import ArrayBundleReader
    import numpy as np

    d = RAMDirectory()
    seg = _rich_segment()
    write_segment(d, seg)
    r = ArrayBundleReader(d.open_mmap(f"{seg.name}.bnd"))
    assert r.meta["codec"] == "DiagonTPU1"
