"""Quantized sparse-vector index + device searcher.

Build: per term, (doc, weight) postings; weights quantize to 8-bit bins
with a per-term scale (``bin = round(w / scale)``, ``scale = max_w / 255``)
— the QBlock quantization idea (reference ``QBlockIndex.h:20-48``) applied
to the Sindi block layout (``SindiIndex.h:20-70``). Bins ride the packed
block format's freq lanes; per-block max bin is the WAND-style upper bound.

Search: score = sum_t q_w[t] * scale[t] * bin — executed by the SAME
block kernel as boolean text queries, with

- per-term block weight  = q_w[t] * scale[t]
- norms                 = all-zero (so the LUT row is row 0)
- tf LUT row 0          = identity: lut[bin] = bin

so ``weight * lut[bin]`` is exactly the dequantized partial dot product.
Quantization error is <= scale/2 per posting (documented approximation,
as in the reference's quantized indexes).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from diagon_tpu.codecs.postings import build_packed_postings
from diagon_tpu.index.segment import SegmentData, SegmentFieldData
from diagon_tpu.search.engine import TermPlan
from diagon_tpu.sparse.vector import SparseVector

NUM_BINS = 255
_MISS = object()


class SparseIndex:
    """Immutable quantized sparse index over a corpus of sparse vectors."""

    def __init__(self, seg: SegmentData, scales: Dict[str, float],
                 exact: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]]
                 = None):
        self.segment = seg
        self.scales = scales
        self.num_docs = seg.num_docs
        # exact per-term CSR (docs i32 asc, weights f32) — the SindiIndex
        # role (reference SindiIndex.h:20-70 is EXACT accumulation); used
        # by the exact search mode and the rerank stage.
        self.exact = exact or {}

    @staticmethod
    def build(vectors: Sequence[SparseVector], name: str = "_sparse") -> "SparseIndex":
        # flatten all (term, doc, weight) triples, then one stable sort by
        # term groups the postings — vectorized CSR build (a per-posting
        # python append loop costs minutes at SPLADE-scale nnz)
        counts = np.fromiter(
            (len(v.ids) for v in vectors), dtype=np.int64, count=len(vectors)
        )
        terms = (
            np.concatenate([np.asarray(v.ids, np.int64) for v in vectors])
            if len(vectors)
            else np.zeros(0, np.int64)
        )
        weights = (
            np.concatenate(
                [np.asarray(v.values, np.float32) for v in vectors]
            )
            if len(vectors)
            else np.zeros(0, np.float32)
        )
        doc_ids = np.repeat(np.arange(len(vectors), dtype=np.int64), counts)
        order = np.argsort(terms, kind="stable")  # doc order kept per term
        terms, doc_ids, weights = terms[order], doc_ids[order], weights[order]
        uniq, starts = np.unique(terms, return_index=True)
        bounds = np.append(starts, len(terms))

        postings = {}
        scales: Dict[str, float] = {}
        exact: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for i, t in enumerate(uniq):
            key = str(int(t))
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            docs = doc_ids[lo:hi]
            ws_arr = weights[lo:hi]
            scale = float(ws_arr.max()) / NUM_BINS if len(ws_arr) else 1.0
            if scale <= 0:
                scale = 1.0
            bins = np.clip(
                np.round(ws_arr / np.float32(scale)), 1, NUM_BINS
            ).astype(np.int64)
            postings[key] = (docs, bins)
            scales[key] = scale
            exact[key] = (docs.astype(np.int32), ws_arr)

        pp = build_packed_postings(postings)
        pp.doc_count_with_field = len(vectors)
        seg = SegmentData(name=name, num_docs=len(vectors))
        seg.fields["_sparse"] = SegmentFieldData(
            postings=pp,
            norms=np.zeros(len(vectors), dtype=np.uint8),
            with_positions=False,
        )
        return SparseIndex(seg, scales, exact)

    def dequantized_weight(self, term: int, bin_value: int) -> float:
        return self.scales[str(term)] * bin_value


class SparseSearcher:
    """Device executor for a SparseIndex (approximate to quantization).

    Runs on the row-bank engine: each query term becomes a host-densified
    dense row of dequantized partial products (weight * scale * bin),
    exactly the quantized-oracle arithmetic; the device sums rows and
    top-ks. The identity LUT (lut[bin] = bin, norms all zero) makes
    ``host_row`` compute precisely ``weight * bin``.
    """

    def __init__(self, index: SparseIndex, device=None):
        import jax

        from diagon_tpu.search.row_engine import (
            RowExecutor,
            RowFieldIndex,
            build_tile_aux,
        )

        self.index = index
        seg = index.segment
        fd = seg.fields["_sparse"]
        pp = fd.postings
        F = int(pp.block_max_freq.max(initial=1)) + 1
        lut = np.tile(np.arange(F, dtype=np.float32), 128)
        # pad to a 1024 multiple: the pruned phase-1 pallas kernel wants
        # doc chunks that are 1024 multiples (128-doc chunks lower but
        # crawl); live masks exclude the pad docs
        num_docs_pad = max(1024, ((seg.num_docs + 1023) // 1024) * 1024)
        ridx = RowFieldIndex(
            pp, fd.norms, num_docs_pad, seg.live_docs, lut, device
        )
        # no idf-scaled heavy bank for sparse (weights are query-dependent;
        # clauses are (tid, weight) light entries the executor decodes on
        # device into the batch-compact bank). The zero heavy bank + its
        # tile aux switch the PRUNED batch path on: phase 1 then runs the
        # MXU approx matmul over the compact bank — the SindiIndex blocked
        # accumulation role (reference SindiIndex.h:20-70) done TPU-style.
        ridx.heavy_bank = jax.device_put(
            jnp.zeros((1, num_docs_pad), jnp.float32), device
        )
        ridx.heavy_ub, ridx.heavy_bits = build_tile_aux(ridx.heavy_bank)
        self.executor = RowExecutor(ridx)
        self.pp = pp
        self.num_docs_pad = num_docs_pad
        self._plan_cache: dict = {}

    def _plan(self, query: SparseVector, pad_to: int = 0,
              alpha: float = 1.0):
        """alpha < 1 enables QBlock-style gain selection (reference
        ``QBlockIndex.h:20-48``): clauses sort by their score upper bound
        (q_w * scale * 255 = q_w * max stored weight) and only the prefix
        covering ``alpha`` of the total upper-bound mass is scored —
        a documented approximation on top of the quantization."""
        cands = []
        for t, w in zip(query.ids, query.values):
            key = str(int(t))
            tid = self.pp.term_id(key)
            if tid < 0:
                continue
            scale = np.float32(self.index.scales[key])
            weight = np.float32(np.float32(w) * scale)
            ub = float(weight) * NUM_BINS  # max contribution of this clause
            cands.append((ub, tid, float(weight)))
        if alpha < 1.0 and cands:
            cands.sort(key=lambda c: -c[0])
            total = sum(c[0] for c in cands)
            acc, cut = 0.0, len(cands)
            for i, c in enumerate(cands):
                acc += c[0]
                if acc >= alpha * total:
                    cut = i + 1
                    break
            cands = cands[:cut]
        tps = [TermPlan(tid, w, should=True) for _, tid, w in cands]
        while len(tps) < pad_to:
            tps.append(TermPlan(-1, 0.0, should=True))
        if not tps:
            return None
        return self.executor.build_plan(
            tps, min_should=1, idf_of_tid=lambda tid: np.float32(np.nan)
        )

    def search(self, query: SparseVector, k: int = 10, alpha: float = 1.0):
        """Top-k docs by quantized dot product -> (scores, docids, hits).
        ``alpha`` < 1 prunes low-gain clauses (QBlock-style, approximate)."""
        plan = self._plan(query, alpha=alpha)
        if plan is None:
            return np.zeros(0, np.float32), np.zeros(0, np.int32), 0
        scores, docs, hits = self.executor.top_k(
            plan, min(k, self.num_docs_pad)
        )
        n = min(int(hits), k)
        return scores[:n], docs[:n], int(hits)

    # -- exact paths (the SindiIndex role + BlockMaxQuantizedIndex rerank) --
    def _exact_rescore(self, query: SparseVector, cands: np.ndarray):
        """Exact f32 dot products for candidate docs, terms accumulated in
        ascending term-id order (the deterministic contract; matches
        search_exact brute force bit-for-bit)."""
        order = np.argsort(np.asarray(query.ids, dtype=np.int64))
        out = np.zeros(len(cands), dtype=np.float32)
        for j in order:
            key = str(int(query.ids[j]))
            e = self.index.exact.get(key)
            if e is None:
                continue
            docs_t, w_t = e
            loc = np.searchsorted(docs_t, cands)
            loc_c = np.minimum(loc, len(docs_t) - 1)
            hit = docs_t[loc_c] == cands
            contrib = np.where(
                hit, np.float32(query.values[j]) * w_t[loc_c], np.float32(0)
            ).astype(np.float32)
            out = (out + contrib).astype(np.float32)
        return out

    def search_rerank(
        self, query: SparseVector, k: int = 10, R: int = 4096
    ):
        """Exact top-k via quantized candidate selection + exact rescore
        (the reference BlockMaxQuantizedIndex rerank stage,
        BlockMaxQuantizedIndex.h:13-56) with an exactness certificate:

        per-doc |exact - quantized| <= hw = 0.5 * sum_t q_w[t]*scale[t],
        so if the exact k-th candidate score clears the quantized score of
        the first EXCLUDED candidate plus hw, no excluded doc can enter
        the top k; otherwise escalate R (up to the full match set), so
        recall is always 1.0.
        """
        hw = np.float32(0.0)
        for t, w in zip(query.ids, query.values):
            s = self.index.scales.get(str(int(t)))
            if s is not None:
                hw += np.float32(0.5) * np.float32(w) * np.float32(s)
        while True:
            RR = min(max(R, k), self.num_docs_pad)
            qs, qd, hits = self.search(query, k=RR)
            if len(qd) == 0:
                return qs[:k], qd[:k], hits
            exact = self._exact_rescore(query, qd)
            order = np.lexsort((qd, -exact))[: min(k, len(qd))]
            top_docs = qd[order]
            top_scores = exact[order]
            covered = len(qd) >= hits  # every matching doc was rescored
            if not covered:
                theta = top_scores[-1] if len(top_scores) >= k else None
                q_excl_upper = qs[-1] + hw  # quantized scores descend
                if theta is None or not (theta > q_excl_upper):
                    R = RR * 4
                    continue
            return top_scores, top_docs, int(hits)

    def search_rerank_batch(
        self, queries: Sequence[SparseVector], k: int = 10, R: int = 1024
    ):
        """Batched exact top-k: ONE quantized device dispatch at k=R for
        the whole batch (one compile shape), host exact rescore per query,
        the same certificate as search_rerank, and per-query escalation
        (rare) only for queries the certificate cannot clear. Returns a
        list of (scores, docids, hits)."""
        RR = min(max(R, k), self.num_docs_pad)
        qres = self.search_batch(queries, RR)
        out = []
        for q, (qs, qd, hits) in zip(queries, qres):
            if len(qd) == 0:
                out.append((qs[:k], qd[:k], hits))
                continue
            hw = np.float32(0.0)
            for t, w in zip(q.ids, q.values):
                s = self.index.scales.get(str(int(t)))
                if s is not None:
                    hw += np.float32(0.5) * np.float32(w) * np.float32(s)
            exact = self._exact_rescore(q, qd)
            order = np.lexsort((qd, -exact))[: min(k, len(qd))]
            top_docs, top_scores = qd[order], exact[order]
            covered = len(qd) >= hits
            if not covered:
                theta = top_scores[-1] if len(top_scores) >= k else None
                if theta is None or not (theta > qs[-1] + hw):
                    out.append(self.search_rerank(q, k, R=RR * 4))
                    continue
            out.append((top_scores, top_docs, int(hits)))
        return out

    def search_exact(self, query: SparseVector, k: int = 10):
        """Brute-force exact search (test oracle for the rerank path)."""
        scores = np.zeros(self.index.num_docs, dtype=np.float32)
        matched = np.zeros(self.index.num_docs, dtype=bool)
        order = np.argsort(np.asarray(query.ids, dtype=np.int64))
        for j in order:
            key = str(int(query.ids[j]))
            e = self.index.exact.get(key)
            if e is None:
                continue
            docs_t, w_t = e
            scores[docs_t] = (
                scores[docs_t] + np.float32(query.values[j]) * w_t
            ).astype(np.float32)
            matched[docs_t] = True
        idx = np.lexsort((np.arange(len(scores)), -scores))
        idx = [d for d in idx if matched[d]][:k]
        return (
            scores[idx].astype(np.float32),
            np.asarray(idx, np.int32),
            int(matched.sum()),
        )

    def _plan_batch(self, queries: Sequence[SparseVector]):
        """Per-query plans padded to a common clause bucket, cached by
        query object identity so re-dispatching a serving batch skips
        plan building AND hits the executor's stacked-batch cache."""
        from diagon_tpu.search.row_engine import _bucket_tq

        pad_to = _bucket_tq(max(max(len(q), 1) for q in queries))
        plans = []
        for q in queries:
            key = (id(q), pad_to)
            hit = self._plan_cache.get(key, _MISS)
            if hit is _MISS:
                hit = self._plan(q, pad_to=pad_to)
                if len(self._plan_cache) > 8192:
                    self._plan_cache.clear()
                self._plan_cache[key] = hit
            plans.append(hit)
        return plans

    def dispatch_batch(self, queries: Sequence[SparseVector], k: int = 10):
        """Enqueue a batch on device; returns a handle for collect_batch
        (the dispatch/collect split lets a serving loop chain batches
        without a device->host round-trip between them)."""
        plans = self._plan_batch(queries)
        live = [p for p in plans if p is not None]
        kk = min(k, self.num_docs_pad)
        fused = self.executor.dispatch(live, kk) if live else None
        return (plans, live, fused, k, kk)

    def collect_batch(self, handle):
        plans, live, fused, k, kk = handle
        out = []
        if live:
            scores, docs, hits = self.executor.finalize(live, fused, kk)
        li = 0
        for p in plans:
            if p is None:
                out.append(
                    (np.zeros(0, np.float32), np.zeros(0, np.int32), 0)
                )
            else:
                n = min(int(hits[li]), k)
                out.append((scores[li][:n], docs[li][:n], int(hits[li])))
                li += 1
        return out

    def search_batch(self, queries: Sequence[SparseVector], k: int = 10):
        """Batched top-k: list of (scores, docids, hits) per query."""
        return self.collect_batch(self.dispatch_batch(queries, k))

    def search_oracle(self, query: SparseVector, k: int = 10):
        """Exact numpy scoring of the QUANTIZED index (test oracle)."""
        from diagon_tpu.codecs.postings import decode_block_numpy

        pp = self.index.segment.fields["_sparse"].postings
        scores = np.zeros(self.index.num_docs, dtype=np.float32)
        matched = np.zeros(self.index.num_docs, dtype=bool)
        for t, w in zip(query.ids, query.values):
            key = str(int(t))
            tid = pp.term_id(key)
            if tid < 0:
                continue
            weight = np.float32(
                np.float32(w) * np.float32(self.index.scales[key])
            )
            for b in range(int(pp.block_start[tid]), int(pp.block_start[tid + 1])):
                docs, bins = decode_block_numpy(pp, b)
                scores[docs] += weight * bins.astype(np.float32)
                matched[docs] = True
        order = np.lexsort((np.arange(len(scores)), -scores))
        order = [d for d in order if matched[d]][:k]
        return scores[order], np.asarray(order, np.int32), int(matched.sum())
