"""On-disk segment format: checksummed multi-array bundle.

One ``<segment>.bnd`` file holds every dense array of a segment (postings
words, block metadata columns, norms, positions, term dictionary bytes, doc
values, points, stored rows) plus a JSON meta header. Properties:

- **Zero-copy**: each array section is 64-byte aligned, so a reader mmaps
  the file and takes dtype views — no decode step; ``jax.device_put`` of a
  view uploads straight to HBM (the TPU analogue of the reference's
  ``MMapDirectory`` zero-copy design, ``MMapDirectory.h:38-54``).
- **Checksummed**: crc32 per array + header crc in the footer (the role of
  the reference's ``CodecUtil`` header/footer framing, ``CodecUtil.h``).
- **Immutable**: segments never change after write; deletes live in
  side ``.liv`` files; commits are ``segments_<gen>.json`` manifests.

Layout:
  [0:8]   magic b"DTPUBND1"
  [8:12]  header length uint32 LE
  [12:..] header JSON (meta + array directory w/ offsets)
  ...     64-byte-aligned array sections
  footer: uint32 crc32(header bytes) + b"DEND"
"""

from __future__ import annotations

import json
import zlib
from typing import Dict, List, Optional

import numpy as np

from diagon_tpu.codecs.postings import PackedPostings
from diagon_tpu.document.document import DocValuesType
from diagon_tpu.index.segment import (
    DocValuesData,
    PointsData,
    SegmentData,
    SegmentFieldData,
)

MAGIC = b"DTPUBND1"
END = b"DEND"
ALIGN = 64


def _align(n: int) -> int:
    return ((n + ALIGN - 1) // ALIGN) * ALIGN


class ArrayBundleWriter:
    def __init__(self, meta: Optional[dict] = None):
        self.meta = meta or {}
        self._arrays: List[tuple] = []  # (name, np.ndarray)

    def add(self, name: str, arr: np.ndarray) -> None:
        self._arrays.append((name, np.ascontiguousarray(arr)))

    def tobytes(self) -> bytes:
        directory = {}
        # First pass with placeholder offsets to size the header; offsets
        # depend on header size, so iterate to fixpoint (2 passes suffice
        # because the JSON length of offsets is bounded).
        def build_header(offsets):
            d = {}
            for (name, arr), off in zip(self._arrays, offsets):
                d[name] = {
                    "dtype": arr.dtype.str,
                    "shape": list(arr.shape),
                    "offset": off,
                    "nbytes": arr.nbytes,
                    "crc32": zlib.crc32(arr.tobytes()) & 0xFFFFFFFF,
                }
            return json.dumps({"meta": self.meta, "arrays": d}).encode()

        offsets = [0] * len(self._arrays)
        for _ in range(3):
            header = build_header(offsets)
            pos = _align(len(MAGIC) + 4 + len(header))
            new_offsets = []
            for name, arr in self._arrays:
                new_offsets.append(pos)
                pos = _align(pos + arr.nbytes)
            if new_offsets == offsets:
                break
            offsets = new_offsets
        header = build_header(offsets)

        out = bytearray()
        out += MAGIC
        out += len(header).to_bytes(4, "little")
        out += header
        for (name, arr), off in zip(self._arrays, offsets):
            out += b"\0" * (off - len(out))
            out += arr.tobytes()
        out += b"\0" * (_align(len(out)) - len(out))
        out += (zlib.crc32(header) & 0xFFFFFFFF).to_bytes(4, "little")
        out += END
        return bytes(out)


class ArrayBundleReader:
    """Reads a bundle from an mmap'd uint8 buffer with zero-copy views."""

    def __init__(self, buf: np.ndarray, verify_checksums: bool = False):
        self.buf = buf
        raw = buf[: len(MAGIC)].tobytes()
        if raw != MAGIC:
            raise IOError(f"bad magic {raw!r}")
        hlen = int.from_bytes(buf[8:12].tobytes(), "little")
        header_bytes = buf[12 : 12 + hlen].tobytes()
        tail = buf[-8:].tobytes()
        if tail[4:] != END:
            raise IOError("truncated bundle (missing footer)")
        want_crc = int.from_bytes(tail[:4], "little")
        if (zlib.crc32(header_bytes) & 0xFFFFFFFF) != want_crc:
            raise IOError("header checksum mismatch")
        header = json.loads(header_bytes)
        self.meta = header["meta"]
        self._dir = header["arrays"]
        if verify_checksums:
            for name in self._dir:
                a = self.array(name)
                if (zlib.crc32(a.tobytes()) & 0xFFFFFFFF) != self._dir[name]["crc32"]:
                    raise IOError(f"array {name!r} checksum mismatch")

    def names(self) -> List[str]:
        return sorted(self._dir)

    def has(self, name: str) -> bool:
        return name in self._dir

    def array(self, name: str) -> np.ndarray:
        e = self._dir[name]
        off, nbytes = e["offset"], e["nbytes"]
        view = self.buf[off : off + nbytes].view(np.dtype(e["dtype"]))
        return view.reshape(e["shape"])


# ---------------------------------------------------------------------------
# Segment <-> bundle
# ---------------------------------------------------------------------------


def _pack_strings(strings: List[bytes]) -> Dict[str, np.ndarray]:
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offs[1:])
    blob = np.frombuffer(b"".join(strings), dtype=np.uint8)
    return {"bytes": blob, "offsets": offs}


def _unpack_strings(blob: np.ndarray, offs: np.ndarray) -> List[bytes]:
    raw = blob.tobytes()
    return [raw[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]


def write_segment(directory, seg: SegmentData) -> List[str]:
    """Serialize a segment into ``<name>.bnd`` (+ ``<name>.liv`` if it has
    deletes). Returns the file names written."""
    meta = {
        "format": 1,
        "codec": "DiagonTPU1",
        "name": seg.name,
        "num_docs": seg.num_docs,
        "fields": {},
        "doc_values": {},
        "points": {},
    }
    w = ArrayBundleWriter(meta)

    for fname, fd in seg.fields.items():
        pp = fd.postings
        p = f"f.{fname}."
        meta["fields"][fname] = {
            "with_positions": fd.with_positions,
            "sum_total_tf": pp.sum_total_tf,
            "sum_doc_freq": pp.sum_doc_freq,
            "doc_count_with_field": pp.doc_count_with_field,
            "max_window_words": pp.max_window_words,
        }
        terms = _pack_strings([t.encode() for t in pp.terms])
        w.add(p + "term_bytes", terms["bytes"])
        w.add(p + "term_offsets", terms["offsets"])
        w.add(p + "block_start", pp.block_start)
        w.add(p + "doc_freq", pp.doc_freq)
        w.add(p + "total_tf", pp.total_tf)
        w.add(p + "block_term", pp.block_term)
        w.add(p + "block_base", pp.block_base)
        w.add(p + "block_count", pp.block_count)
        w.add(p + "block_doc_bits", pp.block_doc_bits)
        w.add(p + "block_freq_bits", pp.block_freq_bits)
        w.add(p + "block_word_off", pp.block_word_off)
        w.add(p + "block_max_freq", pp.block_max_freq)
        w.add(p + "block_max_norm", pp.block_max_norm)
        w.add(p + "block_entry_start", pp.block_entry_start)
        w.add(p + "packed", pp.packed)
        w.add(p + "norms", fd.norms)
        if pp.pos_start is not None:
            # Disk form is compact: positions bit-packed at the field's max
            # width; pos_start is NOT stored — it is exactly
            # cumsum(freqs) (one position per occurrence), reconstructed at
            # read time from the postings (reference stores explicit .pos
            # skip structures; deriving beats storing).
            from diagon_tpu.codecs.bitpack import bits_needed, pack_u32

            pos = pp.positions
            pos_bits = bits_needed(int(pos.max()) if len(pos) else 0)
            meta["fields"][fname]["pos_bits"] = pos_bits
            meta["fields"][fname]["pos_count"] = int(len(pos))
            w.add(p + "positions_packed", pack_u32(pos, pos_bits))

    for fname, dv in seg.doc_values.items():
        p = f"dv.{fname}."
        meta["doc_values"][fname] = {"type": dv.dv_type.name}
        w.add(p + "docs", dv.docs)
        w.add(p + "values", dv.values)
        if dv.ord_values is not None:
            ords = _pack_strings(dv.ord_values)
            w.add(p + "ord_bytes", ords["bytes"])
            w.add(p + "ord_offsets", ords["offsets"])
        if dv.value_start is not None:
            w.add(p + "value_start", dv.value_start)

    for fname, pt in seg.points.items():
        p = f"pt.{fname}."
        meta["points"][fname] = {"is_double": pt.is_double}
        w.add(p + "values", pt.values)
        w.add(p + "docs", pt.docs)

    if seg.stored:
        # row store compressed as a whole (reference .fdt compresses stored
        # fields); offsets index the UNCOMPRESSED blob
        rows = [json.dumps(r, default=str).encode() for r in seg.stored]
        s = _pack_strings(rows)
        meta["stored_compressed"] = True
        w.add(
            "stored.zbytes",
            np.frombuffer(zlib.compress(s["bytes"].tobytes(), 6), np.uint8),
        )
        w.add("stored.offsets", s["offsets"])

    files = []
    bnd = f"{seg.name}.bnd"
    directory.write_bytes(bnd, w.tobytes())
    files.append(bnd)

    if seg.live_docs is not None:
        liv = f"{seg.name}.liv"
        directory.write_bytes(liv, np.packbits(seg.live_docs).tobytes())
        files.append(liv)
    return files


def read_segment(directory, name: str, verify_checksums: bool = False) -> SegmentData:
    """Load a segment from ``<name>.bnd`` (+ optional ``.liv``), zero-copy."""
    r = ArrayBundleReader(directory.open_mmap(f"{name}.bnd"), verify_checksums)
    meta = r.meta
    codec = meta.get("codec", "DiagonTPU1")
    if codec != "DiagonTPU1":
        # dispatch through the registry for future formats
        from diagon_tpu.codecs.registry import for_name

        return for_name(codec).read_segment(directory, name, verify_checksums)
    seg = SegmentData(name=meta["name"], num_docs=meta["num_docs"])

    for fname, fmeta in meta["fields"].items():
        p = f"f.{fname}."
        terms = [
            b.decode()
            for b in _unpack_strings(
                r.array(p + "term_bytes"), r.array(p + "term_offsets")
            )
        ]
        pp = PackedPostings(
            terms=terms,
            block_start=r.array(p + "block_start"),
            doc_freq=r.array(p + "doc_freq"),
            total_tf=r.array(p + "total_tf"),
            block_term=r.array(p + "block_term"),
            block_base=r.array(p + "block_base"),
            block_count=r.array(p + "block_count"),
            block_doc_bits=r.array(p + "block_doc_bits"),
            block_freq_bits=r.array(p + "block_freq_bits"),
            block_word_off=r.array(p + "block_word_off"),
            block_max_freq=r.array(p + "block_max_freq"),
            block_max_norm=r.array(p + "block_max_norm"),
            block_entry_start=r.array(p + "block_entry_start"),
            packed=r.array(p + "packed"),
            sum_total_tf=fmeta["sum_total_tf"],
            sum_doc_freq=fmeta["sum_doc_freq"],
            doc_count_with_field=fmeta["doc_count_with_field"],
            max_window_words=fmeta["max_window_words"],
        )
        if "pos_bits" in fmeta:
            from diagon_tpu.codecs.bitpack import unpack_u32_numpy
            from diagon_tpu.codecs.postings import decode_all_numpy

            pp.positions = unpack_u32_numpy(
                r.array(p + "positions_packed"),
                fmeta["pos_bits"],
                fmeta["pos_count"],
            ).astype(np.int32)
            _, freqs_all = decode_all_numpy(pp)
            pos_start = np.zeros(len(freqs_all) + 1, dtype=np.int64)
            np.cumsum(freqs_all, out=pos_start[1:])
            pp.pos_start = pos_start
        seg.fields[fname] = SegmentFieldData(
            postings=pp,
            norms=r.array(p + "norms"),
            with_positions=fmeta["with_positions"],
        )

    for fname, dmeta in meta["doc_values"].items():
        p = f"dv.{fname}."
        ord_values = None
        if r.has(p + "ord_bytes"):
            ord_values = _unpack_strings(
                r.array(p + "ord_bytes"), r.array(p + "ord_offsets")
            )
        seg.doc_values[fname] = DocValuesData(
            dv_type=DocValuesType[dmeta["type"]],
            docs=r.array(p + "docs"),
            values=r.array(p + "values"),
            ord_values=ord_values,
            value_start=r.array(p + "value_start")
            if r.has(p + "value_start")
            else None,
        )

    for fname, pmeta in meta["points"].items():
        p = f"pt.{fname}."
        seg.points[fname] = PointsData(
            values=r.array(p + "values"),
            docs=r.array(p + "docs"),
            is_double=pmeta["is_double"],
        )

    if r.has("stored.zbytes"):
        blob = np.frombuffer(
            zlib.decompress(r.array("stored.zbytes").tobytes()), np.uint8
        )
        rows = _unpack_strings(blob, r.array("stored.offsets"))
        seg.stored = [json.loads(b) for b in rows]
    elif r.has("stored.bytes"):  # pre-compression bundles
        rows = _unpack_strings(r.array("stored.bytes"), r.array("stored.offsets"))
        seg.stored = [json.loads(b) for b in rows]

    if directory.file_exists(f"{name}.liv"):
        bits = np.frombuffer(
            directory.read_bytes(f"{name}.liv"), dtype=np.uint8
        )
        seg.live_docs = np.unpackbits(bits)[: seg.num_docs].astype(bool)

    return seg
