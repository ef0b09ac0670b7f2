"""Pallas exact-hit-count kernel over presence bitmaps.

The pruned batch path's phase 1 serves two roles: tile selection and the
EXACT per-query live hit count (part of the bit-exactness contract).
Computing both from the full-D bf16 matmul costs Q x U8 x D MACs — at
10M docs and a 1024-query mixed batch that is ~60 ms of MXU time, the
scale-tier wall. Tile selection can ride per-row tile maxima instead
(row_engine phase-0), but hit counts genuinely need a per-doc pass.

This kernel does that pass on BITS: each compact-bank row packs to a
[D/32] u32 presence bitmap (bit d%32 of word d/32 = row matches LIVE doc
d, same packing as row_engine._pack_live_bits). Per query the boolean
algebra is exact:

  base  = AND of required-clause rows     (MUST / FILTER)
  sho   = OR of should-clause rows
  neg   = OR of must_not rows
  match = (use_req ? base : ~0) & (use_sho ? sho : ~0) & ~neg

which equals the oracle's match set whenever min_should <= 1 and every
required clause is present (the caller gates both; an absent required
clause or min_should >= 2 routes the batch back to the matmul kernel).
hits[q] = popcount(match), summed over word chunks.

The bitmap bank stays VMEM-resident per word-chunk (grid outer = chunks,
queries iterated inside), so HBM traffic is ONE read of the [U8, D/32]
bank — 32x less than the bf16 bank — and the VPU does
Q x Tq x D/32 word-ops instead of Q x U8 x D MACs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-query mode word bits (precomputed host-side by the caller)
MODE_REQ = 1  # query has required clauses (all present): AND them
MODE_SHO = 2  # query needs >= 1 should match (min_should >= 1 or no req)
MODE_DEAD = 4  # query can never match (absent required clause): hits 0


def _popcount(x):
    """SWAR popcount of a u32 vector (portable across Mosaic versions)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _mk_kernel(Tq: int, Q: int, WB: int):
    def kernel(cidx_ref, flags_ref, mode_ref, bits_ref, hits_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            hits_ref[...] = jnp.zeros_like(hits_ref)

        ones = jnp.full((1, WB), 0xFFFFFFFF, jnp.uint32)
        zeros = jnp.zeros((1, WB), jnp.uint32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)

        def body(q, acc):
            band = ones
            bor = zeros
            bneg = zeros
            for t in range(Tq):
                # dynamic sublane slice of the VMEM-resident block
                row = bits_ref[pl.ds(cidx_ref[t, q], 1), :]
                fl = flags_ref[t, q]
                band = jnp.where((fl & 2) != 0, band & row, band)
                bor = jnp.where((fl & 4) != 0, bor | row, bor)
                bneg = jnp.where((fl & 8) != 0, bneg | row, bneg)
            mode = mode_ref[0, q]
            m = (
                jnp.where((mode & MODE_REQ) != 0, band, ones)
                & jnp.where((mode & MODE_SHO) != 0, bor, ones)
                & ~bneg
            )
            m = jnp.where((mode & MODE_DEAD) != 0, zeros, m)
            # Mosaic cannot reduce over unsigned ints — count in i32
            # (exact: popcount values <= 32, WB <= 8192 -> < 2^18)
            cnt = jnp.sum(_popcount(m).astype(jnp.int32), dtype=jnp.int32)
            return acc + jnp.where(lane == q, cnt, 0)

        acc = jax.lax.fori_loop(
            0, Q, body, jnp.zeros((1, Q), jnp.int32)
        )
        hits_ref[0:1, :] = hits_ref[0:1, :] + acc

    return kernel


def pallas_bits_hits(
    bits: jnp.ndarray,  # u32 [U8, W] per-row live presence bitmaps
    cidx: jnp.ndarray,  # int32 [Q, Tq] compact row per clause (0 = zero)
    cflags: jnp.ndarray,  # int32 [Q, Tq] bit1 req / bit2 sho / bit3 neg
    qmode: jnp.ndarray,  # int32 [Q] MODE_* word per query
    *,
    interpret: bool = False,
):
    """Exact live hit counts i32 [Q]. Caller contract: min_should <= 1
    for every query, MODE_DEAD set where a required clause is absent,
    MODE_SHO set iff (min_should >= 1 or num_required == 0)."""
    U8, W = bits.shape
    Q, Tq = cidx.shape
    # word chunk: [U8, WB] u32 resident block under ~12 MB of VMEM
    WB = 8192
    while WB > 512 and U8 * WB * 4 > (12 << 20):
        WB //= 2
    if W % WB:
        pad = WB - (W % WB)
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
        W += pad
    n = W // WB

    hits = pl.pallas_call(
        _mk_kernel(Tq, Q, WB),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n,),
            in_specs=[pl.BlockSpec((U8, WB), lambda c, *_: (0, c))],
            out_specs=pl.BlockSpec((8, Q), lambda c, *_: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, Q), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(cidx.T, cflags.T, qmode.reshape(1, Q), bits)
    return hits[0]
