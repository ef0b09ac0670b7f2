"""Device phrase query execution (slop = 0).

Replaces the reference's doc-at-a-time PhraseScorer
(``search/PhraseQuery.cpp:27-202``: conjunction advance + sequential
position-list walk) with a three-stage vectorized plan:

1. **Conjunction**: decode all phrase terms' posting blocks (same kernel as
   boolean scoring) and scatter each term's *posting-entry index* into a
   ``[n_terms, num_docs]`` table; docs where every slot is filled are
   candidates.
2. **Candidate extraction**: ``lax.top_k`` over the candidate mask yields up
   to C candidate docids (static C, doubled and re-run on overflow).
3. **Position intersection**: gather each candidate's per-term position
   lists (padded to the segment's max positions-per-entry) and count lead
   positions ``p`` such that term ``i``'s list contains ``p + i`` for all
   ``i`` — a batched ``searchsorted`` per non-lead term, O(P log P) per
   candidate, all lanes in parallel.

Scoring: BM25 with phraseFreq as tf and the rarest member term's docFreq
for IDF (PhraseQuery.cpp:304-338), via the same host-exact tf lookup table.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diagon_tpu.ops.bitpack_ops import decode_doc_blocks
from diagon_tpu.search.device_index import DeviceSegment

_POS_SENTINEL = np.int32(2**30)


@partial(jax.jit, static_argnames=("window_words", "n_terms", "cand_cap", "pos_cap", "k"))
def phrase_topk(
    packed,
    block_base,
    block_count,
    block_doc_bits,
    block_freq_bits,
    block_word_off,
    block_entry_start,
    pos_start,  # int32 [NE+1]
    positions,  # int32 [NP]
    norms,  # int32 [num_docs_pad]
    tf_lut,  # f32 [128*F]
    live_mask,  # f32 [num_docs_pad]
    blocks,  # int32 [B_pad] blocks of all phrase terms
    slot,  # int32 [B_pad] phrase-term slot of each block (0..n_terms-1)
    idf,  # f32 []
    *,
    window_words: int,
    n_terms: int,
    cand_cap: int,
    pos_cap: int,
    k: int,
):
    num_docs_pad = norms.shape[0]
    bsel = jnp.maximum(blocks, 0)
    docids, _freqs, valid = decode_doc_blocks(
        packed,
        block_word_off[bsel],
        block_base[bsel],
        block_count[bsel],
        block_doc_bits[bsel],
        block_freq_bits[bsel],
        window_words=window_words,
    )
    valid = valid & (blocks >= 0)[:, None]

    # Global posting-entry index of each decoded lane.
    lane = jax.lax.broadcasted_iota(jnp.int32, docids.shape, 1)
    entry = block_entry_start[bsel][:, None] + lane

    # Scatter entry+1 per (slot, doc): 0 means "term absent from doc".
    sidx = jnp.where(valid, docids, num_docs_pad)
    ent = jnp.zeros((n_terms, num_docs_pad + 1), dtype=jnp.int32)
    ent = ent.at[slot[:, None], sidx].add(
        jnp.where(valid, entry + 1, 0), mode="drop"
    )
    ent = ent[:, :num_docs_pad]

    conj = jnp.all(ent > 0, axis=0) & (live_mask > 0)
    n_conj = jnp.sum(conj.astype(jnp.int32))

    # Candidate docids: top_k over the mask picks matching docs, lowest
    # docid first (lax.top_k breaks ties toward lower index).
    _, cand = jax.lax.top_k(conj.astype(jnp.int32), cand_cap)
    cand_ok = conj[cand]

    # Gather per-term position windows for every candidate.
    ent_c = ent[:, :][:, cand] - 1  # [n_terms, C] entry ids (-1 invalid)
    ent_c = jnp.maximum(ent_c, 0)
    p_lo = pos_start[ent_c]  # [n_terms, C]
    p_hi = pos_start[ent_c + 1]
    offs = jnp.arange(pos_cap, dtype=jnp.int32)  # [P]
    gidx = p_lo[:, :, None] + offs[None, None, :]  # [n_terms, C, P]
    in_range = gidx < p_hi[:, :, None]
    gidx = jnp.clip(gidx, 0, positions.shape[0] - 1)
    pos_w = jnp.where(in_range, positions[gidx], _POS_SENTINEL)

    # Lead = slot 0 (host orders slots by ascending docFreq). For each lead
    # position p, term i must contain p + delta_i where delta_i is the term's
    # offset relative to the lead within the phrase.
    lead = pos_w[0]  # [C, P] (sentinel-padded, ascending)
    found = in_range[0]  # lead valid lanes
    for i in range(1, n_terms):
        target = lead + jnp.int32(i)  # slot i sits i positions after slot 0
        arr = pos_w[i]  # [C, P] ascending with sentinel tail
        loc = jax.vmap(jnp.searchsorted)(arr, target)
        loc = jnp.clip(loc, 0, pos_cap - 1)
        hit = jnp.take_along_axis(arr, loc, axis=1) == target
        found = found & hit
    pfreq = jnp.sum(found.astype(jnp.int32), axis=1)  # [C]

    matched = cand_ok & (pfreq > 0)
    hits = jnp.sum(matched.astype(jnp.int32))

    F = tf_lut.shape[0] // 128
    norm_c = norms[jnp.clip(cand, 0, num_docs_pad - 1)]
    tf_factor = tf_lut[norm_c * F + jnp.clip(pfreq, 0, F - 1)]
    scores = jnp.where(matched, idf * tf_factor, jnp.float32(-1.0))

    top_scores, top_i = jax.lax.top_k(scores, k)
    top_docs = cand[top_i]
    # Single fused output -> one host readback. Ints travel as exact f32
    # values (not bitcasts — TPU FTZ flushes denormal bit patterns to 0).
    return jnp.concatenate(
        [
            top_scores,
            top_docs.astype(jnp.float32),
            jnp.stack([hits, n_conj]).astype(jnp.float32),
        ]
    )


class PhraseExecutor:
    """Per-(segment, field) phrase runner with candidate-cap doubling."""

    def __init__(self, segment: DeviceSegment, field_name: str, tf_lut):
        self.segment = segment
        self.field = segment.field(field_name)
        if not self.field.with_positions:
            raise ValueError(
                f"field {field_name!r} was indexed without positions"
            )
        if segment.source is None:
            raise ValueError("phrase execution requires the host segment")
        self._host_pp = segment.source.fields[field_name].postings
        self.tf_lut = tf_lut
        live = segment.live_docs
        if live is None:
            lm = np.zeros(segment.num_docs_pad, dtype=np.float32)
            lm[: segment.num_docs] = 1.0
            self.live_mask = jnp.asarray(lm)
        else:
            self.live_mask = live.astype(jnp.float32)

    def top_k(
        self, terms: List[str], idf: float, k: int
    ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
        f = self.field
        tids = [f.term_id(t) for t in terms]
        if any(t < 0 for t in tids):
            return None  # a term is missing: no phrase matches here

        # Order slots by ascending docFreq (lead = rarest), keeping each
        # slot's positional delta relative to the original phrase. The
        # kernel assumes slot i is at offset i after slot 0; to keep it
        # simple and exact we keep phrase order (deltas are then just i) —
        # the lead-choice optimization only affects speed, not results.
        blocks_l, slot_l = [], []
        for i, tid in enumerate(tids):
            bs, be = int(f.block_start[tid]), int(f.block_start[tid + 1])
            blocks_l.append(np.arange(bs, be, dtype=np.int32))
            slot_l.append(np.full(be - bs, i, dtype=np.int32))
        blocks = np.concatenate(blocks_l)
        slots = np.concatenate(slot_l)
        b_pad = max(16, 1 << int(np.ceil(np.log2(max(1, len(blocks))))))
        blocks_p = np.full(b_pad, -1, dtype=np.int32)
        blocks_p[: len(blocks)] = blocks
        slots_p = np.zeros(b_pad, dtype=np.int32)
        slots_p[: len(slots)] = slots

        # Candidate cap: min docFreq bounds the conjunction size exactly.
        min_df = min(int(f.doc_freq[t]) for t in tids)
        cand_cap = max(128, 1 << int(np.ceil(np.log2(max(1, min_df)))))
        cand_cap = min(cand_cap, self.segment.num_docs_pad)
        # Position window: bounded by the PHRASE terms' own max tf (from the
        # block-max columns), not the field-wide max — typically 4-8x
        # narrower, and the window gathers dominate phrase cost.
        pp_host = self._host_pp
        max_tf = 1
        for t in tids:
            bs, be = int(f.block_start[t]), int(f.block_start[t + 1])
            if be > bs:
                max_tf = max(
                    max_tf, int(pp_host.block_max_freq[bs:be].max())
                )
        pos_cap = max(8, 1 << int(np.ceil(np.log2(max_tf))))

        fused = phrase_topk(
            f.packed,
            f.block_base,
            f.block_count,
            f.block_doc_bits,
            f.block_freq_bits,
            f.block_word_off,
            f.block_entry_start,
            f.pos_start,
            f.positions,
            f.norms,
            self.tf_lut,
            self.live_mask,
            jnp.asarray(blocks_p),
            jnp.asarray(slots_p),
            jnp.float32(idf),
            window_words=f.window_words,
            n_terms=len(terms),
            cand_cap=cand_cap,
            pos_cap=pos_cap,
            k=min(k, cand_cap),
        )
        kk = min(k, cand_cap)
        fused = np.asarray(fused)
        scores = fused[:kk]
        docs = fused[kk : 2 * kk].astype(np.int32)
        hits = int(fused[2 * kk])
        # cand_cap >= min_df >= conjunction size, so no overflow is possible.
        return scores, docs, hits
