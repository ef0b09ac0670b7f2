"""Merge system: tiered merge policy + segment merger + schedulers.

Equivalents of the reference's merge layer (SURVEY.md section 2.4):
``TieredMergePolicy`` (TieredMergePolicy.h:33-112), ``SegmentMerger``
(SegmentMerger.cpp:423-462: k-way term merge with docBase remap), and
``ConcurrentMergeScheduler`` (one background merge thread,
ConcurrentMergeScheduler.cpp:35-66).

The merger differs from the reference's iterator k-way heap: segments are
columnar arrays, so merging is vectorized concat + remap per term (numpy),
then one repack — an array program, not a stream program.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence

import numpy as np

from diagon_tpu.codecs.postings import decode_block_numpy
from diagon_tpu.index.segment import (
    DocValuesData,
    PointsData,
    SegmentData,
    SegmentFieldData,
)


@dataclass
class OneMerge:
    segments: List[SegmentData]


@dataclass
class MergeSpecification:
    merges: List[OneMerge] = dc_field(default_factory=list)


class MergePolicy:
    def find_merges(self, segments: Sequence[SegmentData]) -> MergeSpecification:
        raise NotImplementedError

    def find_forced_merges(
        self, segments: Sequence[SegmentData], max_segment_count: int
    ) -> MergeSpecification:
        raise NotImplementedError


class TieredMergePolicy(MergePolicy):
    """Size-tiered merging (simplified from TieredMergePolicy.h:33-112):
    sort by live-doc count; when a tier (within ``segs_per_tier``x size of
    each other) accumulates >= ``segs_per_tier`` segments, merge the
    smallest ``max_merge_at_once`` of them."""

    def __init__(self, segs_per_tier: int = 10, max_merge_at_once: int = 10):
        self.segs_per_tier = segs_per_tier
        self.max_merge_at_once = max_merge_at_once

    def find_merges(self, segments: Sequence[SegmentData]) -> MergeSpecification:
        spec = MergeSpecification()
        if len(segments) <= self.segs_per_tier:
            return spec
        by_size = sorted(segments, key=lambda s: s.num_live_docs)
        n = min(self.max_merge_at_once, len(by_size) - self.segs_per_tier + 1)
        if n >= 2:
            spec.merges.append(OneMerge(by_size[:n]))
        return spec

    def find_forced_merges(
        self, segments: Sequence[SegmentData], max_segment_count: int
    ) -> MergeSpecification:
        """One round of forced merging, in segment (docid) order so that
        force_merge(1) keeps global doc order stable. The writer re-asks
        until the target count is reached."""
        spec = MergeSpecification()
        if len(segments) <= max_segment_count:
            return spec
        take = min(
            self.max_merge_at_once, len(segments) - max_segment_count + 1
        )
        if take >= 2:
            spec.merges.append(OneMerge(list(segments[:take])))
        return spec


class SegmentMerger:
    """Merges N segments into one, dropping deleted docs and remapping
    docids (the reference's docBase remap, SegmentMerger.cpp:67-149)."""

    @staticmethod
    def merge(
        segments: Sequence[SegmentData],
        name: str,
        live: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> "tuple[SegmentData, List[np.ndarray]]":
        """Merge into one segment.

        ``live`` is an optional per-source live-docs snapshot (taken under
        the writer mutex) so a merge running on the scheduler thread sees a
        consistent view while deletes keep landing; deletes that arrive
        during the merge are re-applied by the writer via the returned
        ``doc_maps`` (old docid -> new docid, -1 = dropped), mirroring the
        reference's merged-deletes commit step.
        """
        # ----- docid remap (compact over deletions) -----
        doc_maps: List[np.ndarray] = []  # old docid -> new docid (-1 deleted)
        new_num_docs = 0
        for si, seg in enumerate(segments):
            snap = live[si] if live is not None else seg.live_docs
            live_mask = (
                np.ones(seg.num_docs, dtype=bool) if snap is None else snap
            )
            m = np.full(seg.num_docs, -1, dtype=np.int64)
            idx = np.nonzero(live_mask)[0]
            m[idx] = new_num_docs + np.arange(len(idx))
            new_num_docs += len(idx)
            doc_maps.append(m)

        out = SegmentData(name=name, num_docs=new_num_docs)

        # ----- inverted fields -----
        field_names: Dict[str, bool] = {}
        for seg in segments:
            for fname, fd in seg.fields.items():
                field_names[fname] = (
                    field_names.get(fname, True) and fd.with_positions
                )

        for fname, with_pos in field_names.items():
            merged_postings: Dict[str, tuple] = {}
            merged_positions: Optional[Dict[str, list]] = (
                {} if with_pos else None
            )
            norms = np.zeros(new_num_docs, dtype=np.uint8)
            doc_count_with_field = 0

            for si, seg in enumerate(segments):
                fd = seg.fields.get(fname)
                if fd is None:
                    continue
                dmap = doc_maps[si]
                src_norms = fd.norms
                live_new = dmap[np.arange(len(src_norms))]
                keep = live_new >= 0
                norms[live_new[keep]] = src_norms[keep]

                pp = fd.postings
                for tid, term in enumerate(pp.terms):
                    docs_parts, freq_parts, pos_parts = [], [], []
                    for b in range(
                        int(pp.block_start[tid]), int(pp.block_start[tid + 1])
                    ):
                        d, f = decode_block_numpy(pp, b)
                        nd = dmap[d]
                        keepb = nd >= 0
                        docs_parts.append(nd[keepb])
                        freq_parts.append(f[keepb])
                        if with_pos and pp.pos_start is not None:
                            estart = int(pp.block_entry_start[b])
                            for j in np.nonzero(keepb)[0]:
                                s0 = int(pp.pos_start[estart + j])
                                e0 = int(pp.pos_start[estart + j + 1])
                                pos_parts.append(pp.positions[s0:e0])
                    docs = np.concatenate(docs_parts) if docs_parts else np.zeros(0, np.int64)
                    if len(docs) == 0:
                        continue
                    freqs = np.concatenate(freq_parts)
                    ex = merged_postings.get(term)
                    if ex is None:
                        merged_postings[term] = ([docs], [freqs])
                        if with_pos:
                            merged_positions[term] = list(pos_parts)
                    else:
                        ex[0].append(docs)
                        ex[1].append(freqs)
                        if with_pos:
                            merged_positions[term].extend(pos_parts)

            if not merged_postings:
                continue

            final_postings = {}
            for term, (dparts, fparts) in merged_postings.items():
                docs = np.concatenate(dparts)
                freqs = np.concatenate(fparts)
                order = np.argsort(docs, kind="stable")
                final_postings[term] = (docs[order], freqs[order])
                if with_pos:
                    plist = merged_positions[term]
                    merged_positions[term] = [plist[i] for i in order]

            from diagon_tpu.codecs.postings import build_packed_postings

            pp_new = build_packed_postings(
                final_postings, merged_positions, norms
            )
            # docs-with-field across sources (live only): norms>0 surviving
            doc_count_with_field = int((norms > 0).sum())
            pp_new.doc_count_with_field = doc_count_with_field
            out.fields[fname] = SegmentFieldData(
                postings=pp_new, norms=norms, with_positions=with_pos
            )

        # ----- doc values -----
        # Multi-valued types (SORTED_NUMERIC/SORTED_SET) store a CSR:
        # ``docs`` is unique docs, ``value_start`` offsets into ``values``.
        # Expand per-segment to flat (doc, value) rows, filter by the doc
        # map, then rebuild the CSR for the merged segment.
        dv_names = {n for seg in segments for n in seg.doc_values}
        for fname in dv_names:
            docs_parts, val_parts = [], []
            dv_type = None
            has_ords = False
            multi = False
            for si, seg in enumerate(segments):
                dv = seg.doc_values.get(fname)
                if dv is None:
                    continue
                dv_type = dv.dv_type
                has_ords = dv.ord_values is not None
                nd = doc_maps[si][dv.docs]
                if dv.value_start is not None:
                    multi = True
                    counts = np.diff(dv.value_start)
                    nd_flat = np.repeat(nd, counts)
                    keep = nd_flat >= 0
                    docs_parts.append(nd_flat[keep])
                    kept_vals = dv.values[keep]
                else:
                    keep = nd >= 0
                    docs_parts.append(nd[keep])
                    kept_vals = dv.values[keep]
                if has_ords:
                    val_parts.append([dv.ord_values[int(o)] for o in kept_vals])
                else:
                    val_parts.append(kept_vals)
            if not docs_parts:
                continue
            docs = np.concatenate(docs_parts).astype(np.int32)
            order = np.argsort(docs, kind="stable")
            if has_ords:
                raw = [v for part in val_parts for v in part]
                raw = [raw[i] for i in order]
                uniq = sorted(set(raw))
                omap = {b: i for i, b in enumerate(uniq)}
                vals = np.asarray([omap[b] for b in raw], dtype=np.int64)
                if multi:
                    from diagon_tpu.index.segment import _multi_value_csr

                    mdocs, mvals, starts = _multi_value_csr(
                        docs[order], vals, sort_vals=True
                    )
                    out.doc_values[fname] = DocValuesData(
                        dv_type, mdocs, mvals, ord_values=uniq,
                        value_start=starts,
                    )
                else:
                    out.doc_values[fname] = DocValuesData(
                        dv_type, docs[order], vals, ord_values=uniq
                    )
            else:
                vals = (
                    np.concatenate(val_parts)[order]
                    if val_parts
                    else np.zeros(0, np.int64)
                )
                if multi:
                    from diagon_tpu.index.segment import _multi_value_csr

                    mdocs, mvals, starts = _multi_value_csr(
                        docs[order], vals, sort_vals=True
                    )
                    out.doc_values[fname] = DocValuesData(
                        dv_type, mdocs, mvals, value_start=starts
                    )
                else:
                    out.doc_values[fname] = DocValuesData(
                        dv_type, docs[order], vals
                    )

        # ----- points -----
        pt_names = {n for seg in segments for n in seg.points}
        for fname in pt_names:
            v_parts, d_parts = [], []
            is_double = False
            for si, seg in enumerate(segments):
                pt = seg.points.get(fname)
                if pt is None:
                    continue
                is_double = pt.is_double
                nd = doc_maps[si][pt.docs]
                keep = nd >= 0
                v_parts.append(pt.values[keep])
                d_parts.append(nd[keep].astype(np.int32))
            vals = np.concatenate(v_parts)
            docs = np.concatenate(d_parts)
            order = np.lexsort((docs, vals))
            out.points[fname] = PointsData(vals[order], docs[order], is_double)

        # ----- stored fields -----
        for si, seg in enumerate(segments):
            dmap = doc_maps[si]
            for old_id, row in enumerate(seg.stored):
                if old_id < len(dmap) and dmap[old_id] >= 0:
                    out.stored.append(row)

        return out, doc_maps


class MergeScheduler:
    def execute(self, writer, spec: MergeSpecification) -> None:
        raise NotImplementedError

    def wait(self) -> None:
        pass

    def close(self) -> None:
        pass


class SerialMergeScheduler(MergeScheduler):
    def execute(self, writer, spec: MergeSpecification) -> None:
        for m in spec.merges:
            writer._do_merge(m)


class ConcurrentMergeScheduler(MergeScheduler):
    """One background merge thread, errors swallowed (like the reference's
    ConcurrentMergeScheduler.cpp:35-66)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def execute(self, writer, spec: MergeSpecification) -> None:
        if not spec.merges:
            return
        self.wait()

        def run():
            for m in spec.merges:
                try:
                    writer._do_merge(m)
                except Exception:  # pragma: no cover - parity w/ reference
                    import traceback

                    traceback.print_exc()

        with self._lock:
            self._thread = threading.Thread(target=run, daemon=True)
            self._thread.start()

    def wait(self) -> None:
        with self._lock:
            t = self._thread
        if t is not None:
            t.join()

    def close(self) -> None:
        self.wait()
