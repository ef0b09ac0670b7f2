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
    hi = hidx_ref[q, t]
    row = jnp.where(hi >= 0, heavy_blk[...], light_blk[...])

    @pl.when(t == 0)
    def _():
        out_ref[...] = row

    @pl.when(t > 0)
    def _():
        out_ref[...] = out_ref[...] + row


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
                    jnp.maximum(hidx_ref[q, t], 0),
                    c,
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, CH, 128),
                lambda q, c, t, hidx_ref, lidx_ref: (
                    jnp.maximum(lidx_ref[q, t], 0),
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
    )(hidx, lidx, hb, lb)
    return out.reshape(Q, D)
