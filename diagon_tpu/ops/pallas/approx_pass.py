"""Pallas fused approx-scoring pass: matmul + tile-max + hit count.

Phase 1 of the pruned batch kernels (row_engine) needs, for every
(query, 128-doc tile): the maximum approximate score, and per query the
exact live-match count. Done in XLA this materializes [Q, D] matmul
outputs in HBM (at Q=1024, D=1M that is 4 GB per role matrix); these
kernels keep each [Q, CHUNK] product block in VMEM and write only the
[G, Q] tile maxima plus a [Q] running hit count, so HBM traffic
collapses to one read of the (batch-compact) bf16 bank.

The banks here are BATCH-COMPACT ([U8, D], U = unique clause rows used
by the batch): phase 1's matmul K-dim scales with the batch's
vocabulary, not the corpus's heavy-term count.

Layout notes: TPU blocks want trailing dims (8k, 128m); the indicator
matrices arrive TRANSPOSED ([U8, Q]) and tile maxima are produced [S, Q]
so Q=batch rides the 128-lane axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _chunk_for(D: int, cap: int) -> int:
    """Largest legal doc-chunk <= cap. The live mask rides as [ng, 128]
    blocks of an [S, 128] array, and Mosaic requires the sublane block
    dim to be 1 or a multiple of 8 (ng = 2..7 fails to lower), so the
    chunk is 128 or a multiple of 1024 that divides D."""
    c = (cap // 1024) * 1024
    while c >= 1024:
        if D % c == 0:
            return c
        c -= 1024
    if D % 128 == 0:
        return 128
    raise ValueError(f"D={D} must be a multiple of 128")


def _dot_ct(b, a_t, out_dtype=jnp.float32):
    """[U8, CH]^T . [U8, Q] -> [CH, Q] — the TRANSPOSED product.

    Producing [CH, Q] puts each 128-doc tile on the SUBLANE-major axis:
    the tile reduction becomes 16 elementwise vreg maxes + a 3-pass
    8-sublane epilogue (one read of the product) instead of a 7-pass
    cross-lane log-shuffle over every product value — the tile-max was
    the phase-1 wall, not the MXU."""
    return jax.lax.dot_general(
        b,
        a_t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def _kernel_or(at_ref, bank_ref, live_ref, tmax_ref, hits_ref):
    c = pl.program_id(0)
    # product accumulates f32 (Mosaic requires 32-bit matmul acc); the
    # tile max rounds ONCE to bf16 on output (rel <= 2^-9; bank rounding
    # adds <= 2^-9): (1+2^-9)^2 < 1 + 2^-7 = _APPROX_RELEPS, so the
    # inflated tile bound still dominates the exact score. The [S, Q]
    # output + its transpose halve. match = (product > 0) stays EXACT
    # (hit counts are part of the bit-exactness contract).
    ap = _dot_ct(bank_ref[...], at_ref[...])  # [CH, Q] f32
    q = ap.shape[1]
    g = ap.reshape(-1, 128, q)  # [ng, 128(docs), Q]
    lv = live_ref[...].reshape(-1, 128)[:, :, None]  # [ng, 128, 1]
    match = (g > 0) & (lv > 0)
    tmax_ref[...] = jnp.max(g, axis=1).astype(jnp.bfloat16)  # [ng, Q]
    cnt_t = jnp.sum(match, axis=1, dtype=jnp.int32)  # [ng, Q]
    cnt = jnp.sum(cnt_t, axis=0, keepdims=True)  # [1, Q] (2-D for mosaic)

    @pl.when(c == 0)
    def _():
        hits_ref[...] = jnp.zeros_like(hits_ref)

    hits_ref[0:1, :] = hits_ref[0:1, :] + cnt


def _kernel_bool(
    asc_ref, arq_ref, ash_ref, ang_ref, bank_ref, params_ref,
    live_ref, tmax_ref, hits_ref,
):
    """General-boolean phase 1: approx score + EXACT per-doc clause
    presence counts (0/1 products accumulate exactly in f32), reduced to
    feasibility-gated tile maxima and exact hit counts. params rows:
    0 = num_required, 1 = min_should.

    The 0/1 presence tile is DERIVED from the score bank in-VMEM
    ((bank > 0) — identical values to the materialized presence bank
    this replaces), so the boolean phase reads ONE bank from HBM
    instead of two and the batch never stores a presence copy.

    Grid is (query-blocks, doc-chunks) with the doc axis INNER so the
    accumulating hits block stays VMEM-resident across consecutive
    steps (outputs revisited non-consecutively are not preserved);
    four [CH, QB] f32 products + masks live in VMEM at once, so QB
    keeps them under the ~16 MB/core budget at any batch size. The
    bank is re-read once per query block — the price of exact
    accumulation; QB=256 keeps that at <= ceil(Q/256) bank reads."""
    c = pl.program_id(1)
    bank = bank_ref[...]
    # compare in f32: Mosaic cannot lower cmpf on packed bf16 vectors
    # ("Target does not support this comparison"); the extension is a
    # VPU-register op, the bank is still read from HBM once as bf16
    pres = jnp.where(
        bank.astype(jnp.float32) > 0, jnp.float32(1.0), jnp.float32(0.0)
    ).astype(jnp.bfloat16)
    ap = _dot_ct(bank, asc_ref[...])  # [CH, Q]
    rc = _dot_ct(pres, arq_ref[...])
    oc = _dot_ct(pres, ash_ref[...])
    nc = _dot_ct(pres, ang_ref[...])
    nreq = params_ref[0:1, :]  # [1, Q] broadcasts over [ng, 128, Q]
    msm = params_ref[1:2, :]
    q = ap.shape[1]
    g = ap.reshape(-1, 128, q)  # [ng, 128(docs), Q]
    rc3 = rc.reshape(-1, 128, q)
    oc3 = oc.reshape(-1, 128, q)
    nc3 = nc.reshape(-1, 128, q)
    lv = live_ref[...].reshape(-1, 128)[:, :, None]
    # compare AFTER the f32 reshapes (mosaic cannot reshape i1 vectors)
    m = (
        (rc3 == nreq)
        & (oc3 >= msm)
        & (nc3 == 0)
        & ((rc3 + oc3) > 0)
        & (lv > 0)
    )
    feasible = jnp.any(m, axis=1)  # [ng, Q]
    tmax = jnp.where(
        feasible, jnp.max(g, axis=1), jnp.float32(-1.0)
    )
    tmax_ref[...] = tmax
    cnt_t = jnp.sum(m, axis=1, dtype=jnp.int32)  # [ng, Q]
    cnt = jnp.sum(cnt_t, axis=0, keepdims=True)  # [1, Q]

    @pl.when(c == 0)
    def _():
        hits_ref[...] = jnp.zeros_like(hits_ref)

    hits_ref[0:1, :] = hits_ref[0:1, :] + cnt


def pallas_approx_select(
    a_t: jnp.ndarray,  # bf16 [U8, Q] transposed clause-indicator matrix
    bank: jnp.ndarray,  # bf16 [U8, D] batch-compact bank
    live: jnp.ndarray,  # f32 [D]
    *,
    interpret: bool = False,
):
    """(tile_max f32 [Q, S], hits i32 [Q]) with S = D/128 — pure-OR.

    The tile max rides in bf16 (see _kernel_or): callers inflate by
    _APPROX_RELEPS which covers the extra rounding."""
    U8, Q = a_t.shape
    _, D = bank.shape
    # one [CH, Q] f32 product (+ masks) in VMEM: cap CH so it stays
    # well under the ~16 MB/core budget at large Q
    chunk = _chunk_for(D, max(1024, min(4096, (1 << 21) // max(Q, 1))))
    S = D // 128
    ng = chunk // 128
    n = D // chunk
    live2 = live.reshape(S, 128)

    tmax_t, hits = pl.pallas_call(
        _kernel_or,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((U8, Q), lambda c: (0, 0)),
            pl.BlockSpec((U8, chunk), lambda c: (0, c)),
            pl.BlockSpec((ng, 128), lambda c: (c, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ng, Q), lambda c: (c, 0)),
            pl.BlockSpec((8, Q), lambda c: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, Q), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, Q), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(a_t, bank, live2)
    return tmax_t.T.astype(jnp.float32), hits[0]


def _kernel_bool2(
    asc_ref, acb_ref, bank_ref, params_ref, live_ref,
    tmax_ref, hits_ref,
):
    """No-negation boolean phase 1 with the required/should presence
    counts FUSED into one matmul: the combined indicator carries
    rq*256 + sh per (row, query) — exact in bf16 when no row serves
    both roles for one query (the builder checks; 4161-style mixed
    digits are NOT bf16-exact) — and the f32 product decodes back to
    exact counts (cc = rc*256 + oc <= 64*256 + 64 < 2^24). Halves the
    phase-1 matmuls of the general boolean kernel for the dominant
    no-MUST_NOT query population. Presence is derived in-VMEM from the
    score bank ((bank > 0), bit-identical to the old materialized
    copy), so the bank is read from HBM once."""
    c = pl.program_id(1)
    bank = bank_ref[...]
    # f32 compare: Mosaic cannot lower cmpf on packed bf16 (see
    # _kernel_bool)
    pres = jnp.where(
        bank.astype(jnp.float32) > 0, jnp.float32(1.0), jnp.float32(0.0)
    ).astype(jnp.bfloat16)
    ap = _dot_ct(bank, asc_ref[...])  # [CH, Q]
    cc = _dot_ct(pres, acb_ref[...])  # [CH, Q] rc*256 + oc
    nreq = params_ref[0:1, :]
    msm = params_ref[1:2, :]
    q = ap.shape[1]
    g = ap.reshape(-1, 128, q)
    cc3 = cc.reshape(-1, 128, q)
    rc3 = jnp.floor(cc3 * jnp.float32(1.0 / 256.0))
    oc3 = cc3 - rc3 * jnp.float32(256.0)
    lv = live_ref[...].reshape(-1, 128)[:, :, None]
    m = (
        (rc3 == nreq)
        & (oc3 >= msm)
        & (cc3 > 0)
        & (lv > 0)
    )
    feasible = jnp.any(m, axis=1)
    tmax_ref[...] = jnp.where(
        feasible, jnp.max(g, axis=1), jnp.float32(-1.0)
    )
    cnt = jnp.sum(
        jnp.sum(m, axis=1, dtype=jnp.int32), axis=0, keepdims=True
    )

    @pl.when(c == 0)
    def _():
        hits_ref[...] = jnp.zeros_like(hits_ref)

    hits_ref[0:1, :] = hits_ref[0:1, :] + cnt


def pallas_approx_select_bool2(
    a_sc_t: jnp.ndarray,  # bf16 [U8, Q]
    a_cb_t: jnp.ndarray,  # bf16 [U8, Q] combined rq*256 + sh indicator
    bank: jnp.ndarray,  # bf16 [U8, D]
    params_t: jnp.ndarray,  # f32 [8, Q]
    live: jnp.ndarray,  # f32 [D]
    *,
    interpret: bool = False,
):
    """(feasibility-gated tile_max f32 [Q, S], exact hits i32 [Q]) for
    no-MUST_NOT boolean batches — 2 matmuls instead of 4, one bank read
    (presence derived in-kernel)."""
    U8, Q = a_sc_t.shape
    _, D = bank.shape
    QB = min(128 if Q <= 128 else 256, _round_up(Q, 128))
    Qp = _round_up(Q, QB)
    if Qp != Q:
        pad = lambda a: jnp.pad(a, ((0, 0), (0, Qp - Q)))
        a_sc_t, a_cb_t, params_t = pad(a_sc_t), pad(a_cb_t), pad(params_t)
    chunk = _chunk_for(D, 2048)  # 2 products -> twice _kernel_bool's CH
    S = D // 128
    ng = chunk // 128
    n = D // chunk
    live2 = live.reshape(S, 128)

    amap = lambda qb, c: (0, qb)
    bmap = lambda qb, c: (0, c)
    tmax_t, hits = pl.pallas_call(
        _kernel_bool2,
        grid=(Qp // QB, n),
        in_specs=[
            pl.BlockSpec((U8, QB), amap),
            pl.BlockSpec((U8, QB), amap),
            pl.BlockSpec((U8, chunk), bmap),
            pl.BlockSpec((8, QB), amap),
            pl.BlockSpec((ng, 128), lambda qb, c: (c, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ng, QB), lambda qb, c: (c, qb)),
            pl.BlockSpec((8, QB), lambda qb, c: (0, qb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, Qp), jnp.float32),
            jax.ShapeDtypeStruct((8, Qp), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(a_sc_t, a_cb_t, bank, params_t, live2)
    return tmax_t[:, :Q].T, hits[0, :Q]


def pallas_approx_select_bool(
    a_sc_t: jnp.ndarray,  # bf16 [U8, Q]
    a_rq_t: jnp.ndarray,
    a_sh_t: jnp.ndarray,
    a_ng_t: jnp.ndarray,
    bank: jnp.ndarray,  # bf16 [U8, D] compact score bank
    params_t: jnp.ndarray,  # f32 [8, Q] rows 0=num_required, 1=min_should
    live: jnp.ndarray,  # f32 [D]
    *,
    interpret: bool = False,
):
    """(feasibility-gated tile_max f32 [Q, S], exact hits i32 [Q]);
    presence derived in-kernel from the score bank."""
    U8, Q = a_sc_t.shape
    _, D = bank.shape
    # query block: 4 [CH, QB] f32 products + masks in VMEM at once
    # (QB=256, CH=1024 -> 4 MB of products); pad Q up to a QB multiple
    # (padded queries have all-zero indicator columns -> no matches)
    QB = min(128 if Q <= 128 else 256, _round_up(Q, 128))
    Qp = _round_up(Q, QB)
    if Qp != Q:
        pad = lambda a: jnp.pad(a, ((0, 0), (0, Qp - Q)))
        a_sc_t, a_rq_t, a_sh_t, a_ng_t, params_t = (
            pad(a_sc_t), pad(a_rq_t), pad(a_sh_t), pad(a_ng_t),
            pad(params_t),
        )
    chunk = _chunk_for(D, 1024)
    S = D // 128
    ng = chunk // 128
    n = D // chunk
    live2 = live.reshape(S, 128)

    amap = lambda qb, c: (0, qb)
    bmap = lambda qb, c: (0, c)
    tmax_t, hits = pl.pallas_call(
        _kernel_bool,
        grid=(Qp // QB, n),
        in_specs=[
            pl.BlockSpec((U8, QB), amap),
            pl.BlockSpec((U8, QB), amap),
            pl.BlockSpec((U8, QB), amap),
            pl.BlockSpec((U8, QB), amap),
            pl.BlockSpec((U8, chunk), bmap),
            pl.BlockSpec((8, QB), amap),
            pl.BlockSpec((ng, 128), lambda qb, c: (c, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ng, QB), lambda qb, c: (c, qb)),
            pl.BlockSpec((8, QB), lambda qb, c: (0, qb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, Qp), jnp.float32),
            jax.ShapeDtypeStruct((8, Qp), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(a_sc_t, a_rq_t, a_sh_t, a_ng_t, bank, params_t, live2)
    return tmax_t[:, :Q].T, hits[0, :Q]
