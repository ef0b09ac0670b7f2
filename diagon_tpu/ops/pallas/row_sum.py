"""Pallas row-sum kernel: the pure-OR scoring hot loop.

The XLA scan version reads+writes the [Q, D] score carry from HBM once per
unroll group; this kernel keeps each (query, doc-tile) accumulator in VMEM
across ALL clauses, so HBM traffic drops to (rows read once + scores
written once) — the speed-of-light for the row-bank design.

Layout: grid (Q, G, Tq) with the clause axis innermost; the output block
(q, g) is revisited across ``t`` (init at t==0, accumulate after). Clause
row ids arrive as scalar-prefetch operands so the BlockSpec index maps can
DMA exactly the needed bank row slice per step. Accumulation is sequential
float32 adds in clause order — bit-identical to the XLA scan and the
scalar oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 min tile is (8, 128); rows are 1-D so blocks are (1, TILE) vectors.
TILE = 1024


def _kernel(hidx_ref, lidx_ref, heavy_blk, light_blk, out_ref):
    t = pl.program_id(2)
    q = pl.program_id(0)
    hi = hidx_ref[t, q]
    row = jnp.where(hi >= 0, heavy_blk[...], light_blk[...])

    @pl.when(t == 0)
    def _():
        out_ref[...] = row

    @pl.when(t > 0)
    def _():
        out_ref[...] = out_ref[...] + row


def _kernel_boolean(
    hidx_ref, lidx_ref, flags_ref, heavy_blk, light_blk,
    s_ref, r_ref, o_ref, n_ref,
):
    """General boolean step: scores + MUST/SHOULD/MUST_NOT indicator counts,
    all four accumulator chunks resident in VMEM across the clause axis.
    flags bit0=scoring bit1=required bit2=should bit3=negated."""
    q = pl.program_id(0)
    t = pl.program_id(2)
    hi = hidx_ref[t, q]
    fl = flags_ref[t, q]
    row = jnp.where(hi >= 0, heavy_blk[...], light_blk[...])
    present = jnp.where(row > 0, jnp.float32(1.0), jnp.float32(0.0))
    zero = jnp.zeros_like(row)
    sc = jnp.where((fl & 1) != 0, row, zero)
    rc = jnp.where((fl & 2) != 0, present, zero)
    oc = jnp.where((fl & 4) != 0, present, zero)
    nc = jnp.where((fl & 8) != 0, present, zero)

    @pl.when(t == 0)
    def _():
        s_ref[...] = sc
        r_ref[...] = rc
        o_ref[...] = oc
        n_ref[...] = nc

    @pl.when(t > 0)
    def _():
        s_ref[...] = s_ref[...] + sc
        r_ref[...] = r_ref[...] + rc
        o_ref[...] = o_ref[...] + oc
        n_ref[...] = n_ref[...] + nc


def pallas_row_boolean(
    heavy_bank: jnp.ndarray,  # f32 [H, D]
    light_bank: jnp.ndarray,  # f32 [L, D]
    hidx: jnp.ndarray,  # int32 [Q, Tq]
    lidx: jnp.ndarray,  # int32 [Q, Tq]
    flags: jnp.ndarray,  # int32 [Q, Tq] bit0 scoring/1 req/2 sho/3 neg
    *,
    interpret: bool = False,
):
    """(scores, req_cnt, sho_cnt, neg_cnt) each f32 [Q, D]."""
    Q, Tq = hidx.shape
    H, D = heavy_bank.shape
    L = light_bank.shape[0]
    assert D % TILE == 0
    S = D // 128
    # 6 chunks live in VMEM (2 in + 4 accumulators): keep each <= 0.5 MB
    CH = min(S, 1024)
    n_chunks = -(-S // CH)
    hb = heavy_bank.reshape(H, S, 128)
    lb = light_bank.reshape(L, S, 128)

    def hmap(q, c, t, hidx_ref, lidx_ref, flags_ref):
        return (jnp.maximum(hidx_ref[t, q], 0), c, 0)

    def lmap(q, c, t, hidx_ref, lidx_ref, flags_ref):
        return (jnp.maximum(lidx_ref[t, q], 0), c, 0)

    def omap(q, c, t, *_):
        return (q, c, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Q, n_chunks, Tq),
        in_specs=[
            pl.BlockSpec((1, CH, 128), hmap),
            pl.BlockSpec((1, CH, 128), lmap),
        ],
        out_specs=tuple(pl.BlockSpec((1, CH, 128), omap) for _ in range(4)),
    )
    outs = pl.pallas_call(
        _kernel_boolean,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((Q, S, 128), jnp.float32) for _ in range(4)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(hidx.T, lidx.T, flags.T, hb, lb)
    return tuple(o.reshape(Q, D) for o in outs)


def pallas_row_sum(
    heavy_bank: jnp.ndarray,  # f32 [H, D]
    light_bank: jnp.ndarray,  # f32 [L, D] (row 0 zero)
    hidx: jnp.ndarray,  # int32 [Q, Tq] (-1 -> light row)
    lidx: jnp.ndarray,  # int32 [Q, Tq]
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """scores f32 [Q, D] = sum over clauses of the selected rows."""
    Q, Tq = hidx.shape
    H, D = heavy_bank.shape
    L = light_bank.shape[0]
    assert D % TILE == 0, f"D ({D}) must be a multiple of {TILE}"
    G = D // TILE

    # TPU blocks need trailing dims (sublane, lane) = multiples of (8, 128);
    # one block = a large contiguous row CHUNK viewed as (CH, 128). Each
    # grid step is one big DMA; the accumulator chunk lives in VMEM across
    # the clause axis (t innermost revisits the same out block). Chunks cap
    # VMEM at ~1 MB/block so double-buffered in+out blocks fit at any D.
    # Chunks need not divide S: Pallas cdiv-pads the boundary block (reads
    # of the pad region are masked downstream by the live mask; OOB writes
    # are dropped). S is a multiple of 8 (D is a multiple of 1024), so CH
    # always satisfies the (8, 128) trailing-dims rule.
    S = D // 128
    CH = min(S, 2048)
    n_chunks = -(-S // CH)
    hb = heavy_bank.reshape(H, S, 128)
    lb = light_bank.reshape(L, S, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # hidx, lidx
        grid=(Q, n_chunks, Tq),
        in_specs=[
            pl.BlockSpec(
                (1, CH, 128),
                lambda q, c, t, hidx_ref, lidx_ref: (
                    jnp.maximum(hidx_ref[t, q], 0),
                    c,
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, CH, 128),
                lambda q, c, t, hidx_ref, lidx_ref: (
                    jnp.maximum(lidx_ref[t, q], 0),
                    c,
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec((1, CH, 128), lambda q, c, t, *_: (q, c, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, S, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(hidx.T, lidx.T, hb, lb)
    return out.reshape(Q, D)
