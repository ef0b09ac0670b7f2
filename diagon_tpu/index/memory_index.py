"""In-memory indexing buffer — the FreqProx equivalent.

Accumulates documents until flush, per field: term -> postings
(docids/freqs/positions), per-doc field lengths for norms, stored rows, doc
values, and points. Mirrors the reference's
``FreqProxTermsWriter.h:24-120`` + ``DocumentsWriterPerThread.cpp:128-369``
single-pass per-field dispatch, minus the arena allocators (Python lists +
numpy suffice host-side; the hot path moves to the C++ tier in
``diagon_tpu/native`` for ingestion throughput).

Norm encoding matches ``DocumentsWriterPerThread.cpp:462-484``:
``norm = length <= 0 ? 127 : min(127, int(127/sqrt(length)))``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Tuple

import numpy as np

from diagon_tpu.document.document import (
    DocValuesType,
    Document,
    IndexOptions,
)


def encode_norm(length: int) -> int:
    """Reference norm encoding (DocumentsWriterPerThread.cpp:462-484)."""
    if length <= 0:
        return 127
    encoded = 127.0 / float(np.sqrt(float(length)))
    if encoded > 127.0:
        return 127
    return int(encoded)  # truncation toward zero, as the C++ static_cast


def decode_norm_to_length(norm: int) -> float:
    """Reference norm decoding (BM25Similarity.h:216-224 / SimScorer)."""
    if norm == 0 or norm == 127:
        return 1.0
    inv = 127.0 / float(norm)
    return inv * inv


@dataclass
class _FieldBuffer:
    index_options: IndexOptions = IndexOptions.NONE
    with_positions: bool = False
    # term -> ([docids], [freqs], [positions per doc])
    postings: Dict[str, Tuple[List[int], List[int], List[List[int]]]] = dc_field(
        default_factory=dict
    )
    field_lengths: Dict[int, int] = dc_field(default_factory=dict)
    doc_count_with_field: int = 0


@dataclass
class _DocValuesBuffer:
    dv_type: DocValuesType = DocValuesType.NONE
    docs: List[int] = dc_field(default_factory=list)
    values: list = dc_field(default_factory=list)


@dataclass
class _PointsBuffer:
    docs: List[int] = dc_field(default_factory=list)
    values: List[float] = dc_field(default_factory=list)
    is_double: bool = False


class MemoryIndex:
    """Mutable per-segment buffer; becomes immutable SegmentData on flush."""

    def __init__(self):
        self.num_docs = 0
        self.fields: Dict[str, _FieldBuffer] = {}
        self.doc_values: Dict[str, _DocValuesBuffer] = {}
        self.points: Dict[str, _PointsBuffer] = {}
        self.stored: List[Dict[str, object]] = []
        self._ram_bytes = 0

    # ------------------------------------------------------------------
    def add_document(self, doc: Document) -> int:
        doc_id = self.num_docs
        self.num_docs += 1
        stored_row: Dict[str, object] = {}

        for f in doc.fields:
            ft = f.type
            if ft.stored:
                stored_row[f.name] = f.value
            if ft.index_options != IndexOptions.NONE:
                self._add_inverted(f, doc_id)
            if ft.doc_values_type != DocValuesType.NONE:
                self._add_doc_values(f, doc_id)
            if ft.point_dims > 0:
                self._add_point(f, doc_id)

        self.stored.append(stored_row)
        return doc_id

    def _add_inverted(self, f, doc_id: int) -> None:
        fb = self.fields.get(f.name)
        if fb is None:
            fb = _FieldBuffer(
                index_options=f.type.index_options,
                with_positions=(
                    f.type.index_options
                    == IndexOptions.DOCS_AND_FREQS_AND_POSITIONS
                ),
            )
            self.fields[f.name] = fb

        tokens = f.tokenize()
        if not tokens:
            return
        fb.doc_count_with_field += 1
        fb.field_lengths[doc_id] = fb.field_lengths.get(doc_id, 0) + len(tokens)

        for pos, tok in enumerate(tokens):
            entry = fb.postings.get(tok)
            if entry is None:
                entry = ([], [], [])
                fb.postings[tok] = entry
                self._ram_bytes += 64 + len(tok)
            docs, freqs, poslists = entry
            if docs and docs[-1] == doc_id:
                freqs[-1] += 1
                if fb.with_positions:
                    poslists[-1].append(pos)
            else:
                docs.append(doc_id)
                freqs.append(1)
                if fb.with_positions:
                    poslists.append([pos])
            self._ram_bytes += 12

    def _add_doc_values(self, f, doc_id: int) -> None:
        dv = self.doc_values.get(f.name)
        if dv is None:
            dv = _DocValuesBuffer(dv_type=f.type.doc_values_type)
            self.doc_values[f.name] = dv
        if dv.dv_type != f.type.doc_values_type:
            raise ValueError(
                f"doc values type mismatch for field {f.name!r}: "
                f"{dv.dv_type} vs {f.type.doc_values_type}"
            )
        dv.docs.append(doc_id)
        dv.values.append(f.value)
        self._ram_bytes += 16

    def _add_point(self, f, doc_id: int) -> None:
        pb = self.points.get(f.name)
        if pb is None:
            pb = _PointsBuffer(is_double=isinstance(f.value, float))
            self.points[f.name] = pb
        pb.docs.append(doc_id)
        pb.values.append(f.value)
        self._ram_bytes += 16

    # ------------------------------------------------------------------
    def ram_bytes_used(self) -> int:
        return self._ram_bytes

    def compute_norms(self, field: str) -> np.ndarray:
        """uint8 norms for every doc in the buffer (0 for docs w/o field)."""
        fb = self.fields[field]
        norms = np.zeros(self.num_docs, dtype=np.uint8)
        for doc_id, length in fb.field_lengths.items():
            norms[doc_id] = encode_norm(length)
        # Docs without the field keep norm 0, which decodes to length 1.0 —
        # same as the reference (missing docs never match anyway).
        return norms

    def field_term_arrays(
        self, field: str
    ) -> Tuple[
        Dict[str, Tuple[np.ndarray, np.ndarray]],
        Optional[Dict[str, List[np.ndarray]]],
    ]:
        """Postings as numpy arrays per term, for the packed codec."""
        fb = self.fields[field]
        postings = {}
        positions: Optional[Dict[str, List[np.ndarray]]] = (
            {} if fb.with_positions else None
        )
        for term, (docs, freqs, poslists) in fb.postings.items():
            postings[term] = (
                np.asarray(docs, dtype=np.int64),
                np.asarray(freqs, dtype=np.int64),
            )
            if positions is not None:
                positions[term] = [np.asarray(p, dtype=np.int32) for p in poslists]
        return postings, positions
