"""Segment-sharded search over a device mesh.

One segment shard per device along mesh axis ``seg``. The full query step —
block gather, bit-unpack, BM25, scatter, local top-k, cross-device
``all_gather`` of (score, global-docid) keys, merged top-k — is one
``shard_map``-ped jitted program, so XLA schedules the ICI collective
against local compute.

Merged ordering is exact: keys are ``(score_bits << 32) | (2^32-1 -
docid)`` int64s, so descending key order = (score desc, global docid asc),
identical to the single-device collector ordering.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diagon_tpu.index.segment import SegmentData
from diagon_tpu.search.bm25 import BM25Similarity
from diagon_tpu.search.engine import (
    TermPlan,
    build_segment_plan,
    make_tf_table,
    score_and_topk_batch,
    unfuse_topk_device,
)
from diagon_tpu.search.query import Occur, Query, TermQuery
from diagon_tpu.search.searcher import IndexSearcher
from diagon_tpu.search.topdocs import ScoreDoc, TopDocs


def merge_topk(scores: jnp.ndarray, docs: jnp.ndarray, k: int):
    """Exact (score desc, docid asc) top-k over the last axis.

    Lexicographic two-key ``lax.sort`` (negated score primary, docid
    secondary) — 32-bit safe (the int64 packed-key trick would silently
    truncate with x64 disabled).
    """
    neg = jnp.negative(scores)
    sorted_neg, sorted_docs = jax.lax.sort(
        (neg, docs), dimension=-1, is_stable=True, num_keys=2
    )
    return -sorted_neg[..., :k], sorted_docs[..., :k]


@partial(jax.jit, static_argnames=("window_words", "k", "mesh", "axis"))
def _sharded_search(
    packed,  # [D, W]
    block_base,  # [D, NB]
    block_count,
    block_doc_bits,
    block_freq_bits,
    block_word_off,
    norms,  # [D, num_docs_pad]
    tf_lut,  # [128*F] replicated
    live_mask,  # [D, num_docs_pad]
    doc_base,  # [D] int32 global docid base per shard
    blocks,  # [D, Q, B_pad]
    weight,  # [D, Q, B_pad]
    req,
    sho,
    neg,
    bool_params,  # [D, Q, 2]
    *,
    window_words: int,
    k: int,
    mesh: Mesh,
    axis: str,
):
    def shard_fn(
        packed,
        block_base,
        block_count,
        block_doc_bits,
        block_freq_bits,
        block_word_off,
        norms,
        tf_lut,
        live_mask,
        doc_base,
        blocks,
        weight,
        req,
        sho,
        neg,
        bool_params,
    ):
        # local leading axis is 1 (one shard per device)
        fused = score_and_topk_batch(
            packed[0],
            block_base[0],
            block_count[0],
            block_doc_bits[0],
            block_freq_bits[0],
            block_word_off[0],
            norms[0],
            tf_lut,
            live_mask[0],
            blocks[0],
            weight[0],
            req[0],
            sho[0],
            neg[0],
            bool_params[0],
            window_words=window_words,
            k=k,
        )
        scores, docs, hits = unfuse_topk_device(fused, k)
        gdocs = docs + doc_base[0]

        all_scores = jax.lax.all_gather(scores, axis)  # [D, Q, k]
        all_docs = jax.lax.all_gather(gdocs, axis)
        D = all_scores.shape[0]
        Q = scores.shape[0]
        flat_scores = jnp.swapaxes(all_scores, 0, 1).reshape(Q, D * k)
        flat_docs = jnp.swapaxes(all_docs, 0, 1).reshape(Q, D * k)
        m_scores, m_docs = merge_topk(flat_scores, flat_docs, k)
        total_hits = jax.lax.psum(hits, axis)  # [Q]
        return m_scores[None], m_docs[None], total_hits[None]

    specs = [P(axis)] * 7 + [P()] + [P(axis)] * 8
    out_specs = (P(axis), P(axis), P(axis))
    f = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=tuple(specs), out_specs=out_specs
    )
    s, d, h = f(
        packed,
        block_base,
        block_count,
        block_doc_bits,
        block_freq_bits,
        block_word_off,
        norms,
        tf_lut,
        live_mask,
        doc_base,
        blocks,
        weight,
        req,
        sho,
        neg,
        bool_params,
    )
    # Every shard computed the same merged result; take shard 0's copy.
    return s[0], d[0], h[0]


class ShardedSearcher:
    """Search across segment shards, one per device on a 1-D mesh.

    Built from per-shard :class:`SegmentData`. All shards are padded to
    common shapes so the stacked arrays shard evenly over the mesh.
    """

    def __init__(self, shards: Sequence[SegmentData], field: str,
                 mesh: Optional[Mesh] = None):
        if mesh is None:
            devs = np.array(jax.devices()[: len(shards)])
            if len(devs) < len(shards):
                raise ValueError(
                    f"{len(shards)} shards but only {len(devs)} devices"
                )
            mesh = Mesh(devs, ("seg",))
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.field = field
        self.shards = list(shards)
        D = len(self.shards)
        if mesh.devices.size != D:
            raise ValueError(
                f"mesh has {mesh.devices.size} devices, need {D} (one per shard)"
            )

        self.doc_bases = np.cumsum([0] + [s.num_docs for s in self.shards])
        self.max_doc = int(self.doc_bases[-1])
        self.sim = BM25Similarity()

        pps = [s.fields[field].postings for s in self.shards]
        self._pps = pps

        # collection stats across shards
        stt = sum(pp.sum_total_tf for pp in pps)
        if stt <= 0:
            stt = self.max_doc * 10
        self.avgdl = BM25Similarity.avg_field_length(stt, self.max_doc)
        max_freq = max(max(1, int(pp.block_max_freq.max(initial=1))) for pp in pps)
        tf_lut_host = make_tf_table(self.avgdl, max_freq)

        # common padded shapes
        self.window_words = max(pp.max_window_words for pp in pps)
        nb_pad = max(8, max(pp.num_blocks for pp in pps))
        w_pad = max(len(pp.packed) for pp in pps) + self.window_words
        nd_pad = max(
            128,
            ((max(s.num_docs for s in self.shards) + 127) // 128) * 128,
        )
        self.num_docs_pad = nd_pad
        self.nb_pad = nb_pad

        def stack(get, fill, dtype, width):
            out = np.full((D, width), fill, dtype=dtype)
            for i, pp in enumerate(pps):
                v = get(pp)
                out[i, : len(v)] = v
            return out

        def shard(arr, spec):
            return jax.device_put(
                jnp.asarray(arr), NamedSharding(self.mesh, spec)
            )

        sp = P(self.axis)
        self.packed = shard(
            stack(lambda p: p.packed, 0, np.uint32, w_pad), sp
        )
        self.block_base = shard(
            stack(lambda p: p.block_base, 0, np.int32, nb_pad), sp
        )
        self.block_count = shard(
            stack(lambda p: p.block_count, 0, np.int32, nb_pad), sp
        )
        self.block_doc_bits = shard(
            stack(lambda p: p.block_doc_bits, 1, np.int32, nb_pad), sp
        )
        self.block_freq_bits = shard(
            stack(lambda p: p.block_freq_bits, 1, np.int32, nb_pad), sp
        )
        self.block_word_off = shard(
            stack(lambda p: p.block_word_off, 0, np.int32, nb_pad), sp
        )

        norms = np.zeros((D, nd_pad), dtype=np.int32)
        live = np.zeros((D, nd_pad), dtype=np.float32)
        for i, s in enumerate(self.shards):
            fd = s.fields[field]
            norms[i, : len(fd.norms)] = fd.norms
            if s.live_docs is None:
                live[i, : s.num_docs] = 1.0
            else:
                live[i, : s.num_docs] = s.live_docs.astype(np.float32)
        self.norms = shard(norms, sp)
        self.live_mask = shard(live, sp)
        self.doc_base = shard(self.doc_bases[:-1].astype(np.int32), sp)
        self.tf_lut = jax.device_put(
            jnp.asarray(tf_lut_host), NamedSharding(self.mesh, P())
        )
        self.tf_lut_host = tf_lut_host

    # ------------------------------------------------------------------
    def term_doc_freq(self, text: str) -> int:
        df = 0
        for pp in self._pps:
            tid = pp.term_id(text)
            if tid >= 0:
                df += int(pp.doc_freq[tid])
        return df

    def _idf(self, text: str, boost: float = 1.0) -> float:
        df = self.term_doc_freq(text)
        if df == 0:
            df = max(1, self.max_doc // 10)
        return float(self.sim.idf(df, self.max_doc) * np.float32(boost))

    def _plans(self, queries: Sequence[Query]):
        """[D, Q, B_pad] plan arrays (per-shard term ids differ)."""
        searcher_like: List[List] = []
        clause_sets = []
        for q in queries:
            if isinstance(q, TermQuery):
                clause_sets.append(([(q, Occur.SHOULD)], 1))
            else:
                clauses = [(c.query, c.occur) for c in q.clauses]
                min_should = q.minimum_number_should_match
                if not any(
                    o in (Occur.MUST, Occur.FILTER) for _, o in clauses
                ):
                    min_should = max(min_should, 1)
                clause_sets.append((clauses, min_should))

        idf_cache: Dict[str, float] = {}

        def idf(q: TermQuery) -> float:
            key = q.term.text
            if key not in idf_cache:
                idf_cache[key] = self._idf(key, q.boost)
            return idf_cache[key]

        D = len(self.shards)
        per_shard_plans = []
        b_max = 16
        for pp in self._pps:
            shard_plans = []
            for clauses, min_should in clause_sets:
                tps = []
                for q, occ in sorted(clauses, key=lambda c: c[0].term.text):
                    tid = pp.term_id(q.term.text)
                    if occ == Occur.MUST:
                        tps.append(TermPlan(tid, idf(q), required=True))
                    elif occ == Occur.FILTER:
                        tps.append(TermPlan(tid, 0.0, required=True))
                    elif occ == Occur.SHOULD:
                        tps.append(TermPlan(tid, idf(q), should=True))
                    else:
                        tps.append(TermPlan(tid, 0.0, negated=True))

                class _F:  # minimal shim with block_start attr
                    block_start = pp.block_start

                plan = build_segment_plan(
                    _F, tps, min_should, float(1.0 / self.avgdl)
                )
                shard_plans.append(plan)
                b_max = max(b_max, plan.b_pad)
            per_shard_plans.append(shard_plans)

        Q = len(queries)
        blocks = np.full((D, Q, b_max), -1, dtype=np.int32)
        weight = np.zeros((D, Q, b_max), dtype=np.float32)
        req = np.zeros((D, Q, b_max), dtype=np.float32)
        sho = np.zeros((D, Q, b_max), dtype=np.float32)
        neg = np.zeros((D, Q, b_max), dtype=np.float32)
        bool_params = np.zeros((D, Q, 2), dtype=np.float32)
        for d in range(D):
            for qi, plan in enumerate(per_shard_plans[d]):
                n = plan.b_pad
                blocks[d, qi, :n] = plan.blocks
                weight[d, qi, :n] = plan.weight
                req[d, qi, :n] = plan.req
                sho[d, qi, :n] = plan.sho
                neg[d, qi, :n] = plan.neg
                bool_params[d, qi] = (plan.num_required, plan.min_should)

        sp3 = NamedSharding(self.mesh, P(self.axis))
        return tuple(
            jax.device_put(jnp.asarray(a), sp3)
            for a in (blocks, weight, req, sho, neg, bool_params)
        )

    def search_batch(self, queries: Sequence[Query], k: int = 10) -> List[TopDocs]:
        plan_args = self._plans(queries)
        scores, docs, hits = _sharded_search(
            self.packed,
            self.block_base,
            self.block_count,
            self.block_doc_bits,
            self.block_freq_bits,
            self.block_word_off,
            self.norms,
            self.tf_lut,
            self.live_mask,
            self.doc_base,
            *plan_args,
            window_words=self.window_words,
            k=k,
            mesh=self.mesh,
            axis=self.axis,
        )
        scores = np.asarray(scores)
        docs = np.asarray(docs)
        hits = np.asarray(hits)
        out = []
        for qi in range(len(queries)):
            n = int(hits[qi])
            sds = [
                ScoreDoc(int(d), float(s))
                for s, d in zip(scores[qi], docs[qi])
                if s >= 0.0
            ][:n]
            out.append(TopDocs(n, sds))
        return out

    def search(self, query: Query, k: int = 10) -> TopDocs:
        return self.search_batch([query], k)[0]
