"""Tile-grid scoring engine — the scatter-free TPU scoring path.

Why: XLA lowers scatter-add to serialized per-element updates on TPU, so
the v1 engine's dense-score scatter collapses at scale (5.9 s for a
128-query OR-20 batch over 19k docs). This engine has NO scatter anywhere:

- The doc space is a ``[G, 128]`` grid (G = num_docs/128 tiles) — the
  document axis becomes the VPU lane axis.
- At load time each term gets a **tile-CSR row**: ``tile_start[t, g]`` =
  index of the term's first posting with ``docid >= g*128`` (host
  ``searchsorted``, stored as one [T, G+1] device array). A (term, tile)
  cell's postings are a <=128-entry window of the flat posting arrays.
- Scoring a cell: gather the window, mask to the tile, **dense-ify the
  freqs onto the 128 lanes with a vectorized binary search** (rel docids
  are sorted + unique within a tile, so each lane has at most one source
  entry — exact, branch-free, no scatter).
- Terms accumulate with ``lax.scan`` in sorted-term order — the same
  float32 addition order as the scalar oracle, preserving bit-exactness.
- Boolean MUST/SHOULD/MUST_NOT become indicator sums over the same lanes;
  one ``lax.top_k`` over the flattened grid finishes the query.

This is the block-at-a-time masked-BM25 design from SURVEY.md section 7 in
its natural TPU shape: the reference's WAND heaps (WANDScorer.h) do
doc-at-a-time pointer-chasing; here every (term, tile) is one vector op.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diagon_tpu.search.engine import BM25_K1, BM25_B  # reuse constants

LANE = 128  # docs per tile (the VPU lane width)


def _bucket(n: int, minimum: int = 8) -> int:
    return max(minimum, 1 << math.ceil(math.log2(max(1, n))))


@dataclass
class TileIndexArrays:
    """Device arrays for one field's tile-grid view."""

    flat_docs: jnp.ndarray  # int32 [NE+LANE] posting docids (term-major)
    flat_freqs: jnp.ndarray  # int32 [NE+LANE]
    tile_start: jnp.ndarray  # int32 [T, G+1]
    norms2d: jnp.ndarray  # int32 [G, LANE]
    live2d: jnp.ndarray  # f32 [G, LANE]
    num_tiles: int
    num_docs_pad: int


def build_tile_arrays(pp, norms: np.ndarray, num_docs_pad: int,
                      live_docs: Optional[np.ndarray], device=None) -> TileIndexArrays:
    """Host-side construction of the tile-grid view of a packed field."""
    from diagon_tpu.codecs.postings import decode_all_numpy

    docs, freqs = decode_all_numpy(pp)
    G = num_docs_pad // LANE
    T = pp.num_terms

    entry_start = np.zeros(T + 1, dtype=np.int64)
    # per-term entry offsets = block_entry_start at each term's first block
    entry_start[:T] = pp.block_entry_start[pp.block_start[:T]]
    entry_start[T] = len(docs)

    bounds = np.arange(G + 1, dtype=np.int64) * LANE
    tile_start = np.empty((T, G + 1), dtype=np.int32)
    for t in range(T):
        s, e = entry_start[t], entry_start[t + 1]
        tile_start[t] = s + np.searchsorted(docs[s:e], bounds)

    norms2d = np.zeros(num_docs_pad, dtype=np.int32)
    norms2d[: len(norms)] = norms.astype(np.int32)

    live2d = np.zeros(num_docs_pad, dtype=np.float32)
    n_real = len(norms)
    if live_docs is None:
        live2d[:n_real] = 1.0
    else:
        live2d[: len(live_docs)] = live_docs.astype(np.float32)

    pad = np.full(LANE, 2**30, dtype=np.int32)  # windows never match
    dev = lambda x: jax.device_put(jnp.asarray(x), device)
    return TileIndexArrays(
        flat_docs=dev(np.concatenate([docs, pad])),
        flat_freqs=dev(np.concatenate([freqs, np.zeros(LANE, np.int32)])),
        tile_start=dev(tile_start),
        norms2d=dev(norms2d.reshape(G, LANE)),
        live2d=dev(live2d.reshape(G, LANE)),
        num_tiles=G,
        num_docs_pad=num_docs_pad,
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _densify_term(flat_docs, flat_freqs, tile_row, G: int):
    """One term -> dense per-lane freqs [G, LANE] (0 = term absent).

    tile_row: int32 [G+1] window starts per tile for this term.
    """
    starts = tile_row[:-1]  # [G]
    counts = tile_row[1:] - starts  # [G] (<= LANE)
    offs = jnp.arange(LANE, dtype=jnp.int32)
    widx = starts[:, None] + offs[None, :]  # [G, LANE]
    widx = jnp.minimum(widx, flat_docs.shape[0] - 1)
    docs_w = flat_docs[widx]
    freqs_w = flat_freqs[widx]
    emask = offs[None, :] < counts[:, None]

    tile_base = (
        jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) * LANE
    )
    rel = jnp.where(emask, docs_w - tile_base, jnp.int32(LANE))  # [G, LANE]

    # lane l's source entry: binary search in the (sorted) rel window
    lane_iota = jnp.broadcast_to(offs[None, :], (G, LANE))
    ss = jax.vmap(jnp.searchsorted)(rel, lane_iota)  # [G, LANE]
    ss = jnp.minimum(ss, LANE - 1)
    hit = jnp.take_along_axis(rel, ss, axis=1) == lane_iota
    freq_lane = jnp.where(
        hit, jnp.take_along_axis(freqs_w, ss, axis=1), jnp.int32(0)
    )
    return freq_lane


@partial(jax.jit, static_argnames=("k",))
def tile_score_topk(
    flat_docs,
    flat_freqs,
    tile_start,  # int32 [T, G+1]
    norms2d,  # int32 [G, LANE]
    live2d,  # f32 [G, LANE]
    lut_bank,  # f32 [NLUT, 128*F] — per-clause PRE-SCALED tf tables
    terms,  # int32 [Q, Tq] term ids (-1 = pad)
    lut_ids,  # int32 [Q, Tq] lut_bank row per clause
    req,  # f32 [Q, Tq]
    sho,  # f32 [Q, Tq]
    neg,  # f32 [Q, Tq]
    bool_params,  # f32 [Q, 2]: num_required, min_should
    *,
    k: int,
):
    """Batched boolean scoring on the tile grid -> fused [Q, 2k+1].

    Each clause's weight (idf*boost) is folded into its ``lut_bank`` row on
    the HOST in numpy float32 — the device does gather + add only. Besides
    removing a multiply, this is the bit-exactness guarantee: XLA contracts
    any device mul+add into an FMA (even across optimization_barrier /
    bitcast round-trips), which diverges from the oracle's separately
    rounded products.
    """
    G = norms2d.shape[0]
    F = lut_bank.shape[1] // 128
    lut_norm_base = norms2d * F  # [G, LANE]

    def one_query(terms_q, lut_q, req_q, sho_q, neg_q, params_q):
        def step(carry, inputs):
            scores, req_c, sho_c, neg_c = carry
            tid, lid, r, s, n = inputs
            row = tile_start[jnp.maximum(tid, 0)]
            freq_lane = _densify_term(flat_docs, flat_freqs, row, G)
            freq_lane = jnp.where(tid >= 0, freq_lane, 0)
            contrib = lut_bank[lid][
                lut_norm_base + jnp.minimum(freq_lane, F - 1)
            ]
            scores = scores + contrib
            ind = (freq_lane > 0).astype(jnp.float32)
            req_c = req_c + r * ind
            sho_c = sho_c + s * ind
            neg_c = neg_c + n * ind
            return (scores, req_c, sho_c, neg_c), None

        zero = jnp.zeros((G, LANE), jnp.float32)
        (scores, req_c, sho_c, neg_c), _ = jax.lax.scan(
            step,
            (zero, zero, zero, zero),
            (terms_q, lut_q, req_q, sho_q, neg_q),
        )
        num_required, min_should = params_q[0], params_q[1]
        mask = (
            (req_c == num_required)
            & (sho_c >= min_should)
            & (neg_c == 0)
            & ((req_c + sho_c) > 0)
            & (live2d > 0)
        )
        final = jnp.where(mask, scores, jnp.float32(-1.0)).reshape(-1)
        top_scores, top_docs = jax.lax.top_k(final, k)
        hits = jnp.sum(mask.astype(jnp.int32))
        return jnp.concatenate(
            [
                top_scores,
                top_docs.astype(jnp.float32),
                hits[None].astype(jnp.float32),
            ]
        )

    return jax.vmap(one_query)(terms, lut_ids, req, sho, neg, bool_params)


@partial(jax.jit, static_argnames=())
def tile_count(
    flat_docs, flat_freqs, tile_start, norms2d, live2d, lut_bank,
    terms, lut_ids, req, sho, neg, bool_params,
):
    """Match counts only -> int32 [Q]."""
    G = norms2d.shape[0]

    def one_query(terms_q, req_q, sho_q, neg_q, params_q):
        def step(carry, inputs):
            req_c, sho_c, neg_c = carry
            tid, r, s, n = inputs
            row = tile_start[jnp.maximum(tid, 0)]
            freq_lane = _densify_term(flat_docs, flat_freqs, row, G)
            ind = ((freq_lane > 0) & (tid >= 0)).astype(jnp.float32)
            return (req_c + r * ind, sho_c + s * ind, neg_c + n * ind), None

        zero = jnp.zeros((G, LANE), jnp.float32)
        (req_c, sho_c, neg_c), _ = jax.lax.scan(
            step, (zero, zero, zero), (terms_q, req_q, sho_q, neg_q)
        )
        mask = (
            (req_c == params_q[0])
            & (sho_c >= params_q[1])
            & (neg_c == 0)
            & ((req_c + sho_c) > 0)
            & (live2d > 0)
        )
        return jnp.sum(mask.astype(jnp.int32))

    return jax.vmap(one_query)(terms, req, sho, neg, bool_params)


# ---------------------------------------------------------------------------
# Plans + executor
# ---------------------------------------------------------------------------


@dataclass
class TilePlan:
    terms: np.ndarray  # int32 [Tq_pad]
    weight: np.ndarray  # f32 [Tq_pad]
    req: np.ndarray
    sho: np.ndarray
    neg: np.ndarray
    num_required: int
    min_should: int


def build_tile_plan(term_plans, min_should: int) -> TilePlan:
    """term_plans: sequence of engine.TermPlan in ORACLE accumulation order
    (sorted by term text within each occur group, groups in
    MUST/FILTER/SHOULD/MUST_NOT order — matching OracleSearcher)."""
    n = len(term_plans)
    tq = _bucket(n)
    terms = np.full(tq, -1, dtype=np.int32)
    weight = np.zeros(tq, dtype=np.float32)
    req = np.zeros(tq, dtype=np.float32)
    sho = np.zeros(tq, dtype=np.float32)
    neg = np.zeros(tq, dtype=np.float32)
    num_required = 0
    for i, tp in enumerate(term_plans):
        if tp.required:
            num_required += 1
        terms[i] = tp.term_id  # -1 stays -1 for missing terms
        weight[i] = tp.weight if tp.term_id >= 0 else 0.0
        req[i] = 1.0 if (tp.required and tp.term_id >= 0) else 0.0
        sho[i] = 1.0 if (tp.should and tp.term_id >= 0) else 0.0
        neg[i] = 1.0 if (tp.negated and tp.term_id >= 0) else 0.0
    return TilePlan(terms, weight, req, sho, neg, num_required, min_should)


class TileExecutor:
    """Per-(segment, field) tile-grid executor.

    ``tf_lut_host`` is the unscaled float32 tf table (numpy); per-clause
    weight-scaled rows are built on the host per batch and uploaded as a
    small LUT bank (deduplicated by weight bits).
    """

    def __init__(self, arrays: TileIndexArrays, tf_lut_host: np.ndarray):
        self.arrays = arrays
        self.tf_lut_host = np.asarray(tf_lut_host, dtype=np.float32)

    def _stack(self, plans: Sequence[TilePlan]):
        tq = _bucket(max(len(p.terms) for p in plans))

        def pad(get, fill, dtype):
            out = np.full((len(plans), tq), fill, dtype=dtype)
            for i, p in enumerate(plans):
                v = get(p)
                out[i, : len(v)] = v
            return out

        terms = pad(lambda p: p.terms, -1, np.int32)
        weight = pad(lambda p: p.weight, 0.0, np.float32)

        # LUT bank: one weight-scaled row per distinct weight (f32-exact
        # host multiply, matching the oracle's idf * tf product).
        bank_rows: List[np.ndarray] = [np.zeros_like(self.tf_lut_host)]
        bank_ids: Dict[int, int] = {0: 0}  # weight bits -> row
        lut_ids = np.zeros_like(terms)
        for i in range(terms.shape[0]):
            for j in range(terms.shape[1]):
                w = weight[i, j]
                bits = int(np.float32(w).view(np.int32))
                row = bank_ids.get(bits)
                if row is None:
                    row = len(bank_rows)
                    bank_rows.append(
                        (np.float32(w) * self.tf_lut_host).astype(np.float32)
                    )
                    bank_ids[bits] = row
                lut_ids[i, j] = row

        # pad the bank to a power of two so jit shapes stay bucketed
        nb = _bucket(len(bank_rows), minimum=2)
        while len(bank_rows) < nb:
            bank_rows.append(np.zeros_like(self.tf_lut_host))

        return (
            jnp.asarray(np.stack(bank_rows)),
            jnp.asarray(terms),
            jnp.asarray(lut_ids),
            jnp.asarray(pad(lambda p: p.req, 0.0, np.float32)),
            jnp.asarray(pad(lambda p: p.sho, 0.0, np.float32)),
            jnp.asarray(pad(lambda p: p.neg, 0.0, np.float32)),
            jnp.asarray(
                [[p.num_required, p.min_should] for p in plans],
                dtype=jnp.float32,
            ),
        )

    def _index_args(self):
        a = self.arrays
        return (
            a.flat_docs,
            a.flat_freqs,
            a.tile_start,
            a.norms2d,
            a.live2d,
        )

    def top_k_batch(self, plans: Sequence[TilePlan], k: int):
        from diagon_tpu.search.engine import unfuse_topk

        fused = tile_score_topk(
            *self._index_args(), *self._stack(plans), k=k
        )
        return unfuse_topk(fused, k)

    def top_k(self, plan: TilePlan, k: int):
        scores, docs, hits = self.top_k_batch([plan], k)
        return scores[0], docs[0], hits[0]

    def count_batch(self, plans: Sequence[TilePlan]) -> np.ndarray:
        return np.asarray(
            tile_count(*self._index_args(), *self._stack(plans))
        )

    def count(self, plan: TilePlan) -> int:
        return int(self.count_batch([plan])[0])
