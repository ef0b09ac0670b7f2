"""Pallas gather-rescore kernel: phase 2 of block-max pruned scoring.

The pruned path's exact rescore must fetch, for every query, the B
selected 128-doc tiles of each clause's score row. Expressed as an XLA
gather this is latency/implementation-bound (~10.7 GB/s for 512-byte
rows, ~22 GB/s for any larger row — measured on v5e; HBM streams at
~370 GB/s), and it was the 1M-doc throughput wall.

This kernel owns the fetch instead: the batch's clause rows are first
compacted into a small tile-major bank ``[G, U8, LANE]`` (U = unique
rows used by the batch, ~Tq for a homogeneous batch), so one selected
tile = one contiguous ``[U8, LANE]`` slab. Per query the kernel streams
its B slabs HBM->VMEM with a ring of ``NSLOT`` in-flight DMAs (manual
``make_async_copy``; latency hides behind the ring) and accumulates
clause rows out of VMEM in oracle clause order — sequential f32 adds,
bit-identical to the XLA scan and the numpy oracle.

Outputs are per-(query, tile) score lanes ``[Q, B, LANE]`` (plus
presence-count lanes in the boolean variant); tile top-k and the
exactness certificate stay in XLA (row_engine._topk_in_tiles_q).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSLOT = 8  # in-flight slab DMAs per query (ring kernel)

# The resident kernel holds BOTH double-buffered slab sets in VMEM:
# 2 * U8 * B * LANE * 4 bytes. Mosaic's scoped footprint is ~3.2x that
# (dynamic-slice temporaries in the unrolled clause loop — measured:
# a 5.98 MB slab scratch compiled to a 19.21 MB scoped allocation and
# OOM'd the 16 MB VMEM budget at Q=896 B=146 U8=40, the 10M-doc mixed
# tier), so the slab budget stays at 4 MB and larger B rescoreds run in
# B-chunks (see pallas_gather_rescore; chunking is bit-invariant).
RESIDENT_VMEM_BUDGET = 4 << 20
# below this chunk width the per-call overhead beats the resident
# kernel's vector ops; huge-U8 banks fall back to the DMA ring
RESIDENT_MIN_CHUNK = 16


def _mk_kernel(B: int, Tq: int, boolean: bool):
    def kernel(*refs):
        if boolean:
            (cidx_ref, tsel_ref, flags_ref, bank_ref,
             s_ref, r_ref, o_ref, n_ref, slabs, sems) = refs
        else:
            cidx_ref, tsel_ref, bank_ref, s_ref, slabs, sems = refs
        q = pl.program_id(0)

        # scalar operands arrive TRANSPOSED ([Tq, Q] / [B, Q]): SMEM pads
        # the minor dim to 128, so Q must ride it (1024x32 padded to
        # 1024x128 = 512 KB blew the 1 MB SMEM budget).
        def issue(b, slot):
            pltpu.make_async_copy(
                bank_ref.at[tsel_ref[b, q]], slabs.at[slot], sems.at[slot]
            ).start()

        for b in range(min(NSLOT, B)):
            issue(b, b % NSLOT)

        for b in range(B):
            slot = b % NSLOT
            pltpu.make_async_copy(
                bank_ref.at[tsel_ref[b, q]], slabs.at[slot], sems.at[slot]
            ).wait()
            # sequential f32 adds in clause order (oracle order)
            acc = jnp.zeros((1, slabs.shape[2]), jnp.float32)
            if boolean:
                rc = jnp.zeros_like(acc)
                oc = jnp.zeros_like(acc)
                nc = jnp.zeros_like(acc)
            for t in range(Tq):
                row = slabs[slot, pl.ds(cidx_ref[t, q], 1), :]
                if boolean:
                    fl = flags_ref[t, q]
                    present = jnp.where(
                        row > 0, jnp.float32(1.0), jnp.float32(0.0)
                    )
                    zero = jnp.zeros_like(row)
                    acc = acc + jnp.where((fl & 1) != 0, row, zero)
                    rc = rc + jnp.where((fl & 2) != 0, present, zero)
                    oc = oc + jnp.where((fl & 4) != 0, present, zero)
                    nc = nc + jnp.where((fl & 8) != 0, present, zero)
                else:
                    acc = acc + row
            s_ref[0, b, :] = acc[0]
            if boolean:
                r_ref[0, b, :] = rc[0]
                o_ref[0, b, :] = oc[0]
                n_ref[0, b, :] = nc[0]
            # reuse the slot only after its slab was consumed
            if b + NSLOT < B:
                issue(b + NSLOT, slot)

    return kernel


def _mk_kernel_resident(B: int, Tq: int, boolean: bool):
    """All-resident variant: every selected slab of the current query
    lives in VMEM at once (slabs [2, B, U8, LANE], double-buffered across
    queries), so the clause loop adds [B, LANE] vectors — Tq VPU ops per
    query instead of B*Tq [1, LANE] ops. The slab axis is OUTERMOST so
    each DMA writes one contiguous [U8, LANE] block (the previous
    [2, U8, B, LANE] layout split every slab DMA into U8 strided 512-byte
    pieces — DMA-latency-bound, and the phase-2 wall at B >= 128); the
    clause loop reads a dynamic sublane slice instead. Per-doc f32
    accumulation order is unchanged (sequential in t for every lane), so
    results stay bit-exact vs the ring kernel, the XLA scan, and the
    numpy oracle."""

    def kernel(*refs):
        if boolean:
            (cidx_ref, tsel_ref, flags_ref, bank_ref,
             s_ref, r_ref, o_ref, n_ref, slabs, sems) = refs
        else:
            cidx_ref, tsel_ref, bank_ref, s_ref, slabs, sems = refs
        q = pl.program_id(0)
        nq = pl.num_programs(0)
        slot = jax.lax.rem(q, 2)

        def issue(qq, sl):
            # one contiguous [U8, LANE] slab per DMA
            for b in range(B):
                pltpu.make_async_copy(
                    bank_ref.at[tsel_ref[b, qq]],
                    slabs.at[sl, b],
                    sems.at[sl, b],
                ).start()

        @pl.when(q == 0)
        def _():
            issue(0, 0)

        # prefetch the next query's slabs into the other buffer (that
        # buffer's previous consumer was program q-1, already done —
        # the grid is sequential)
        @pl.when(q + 1 < nq)
        def _():
            issue(q + 1, 1 - slot)

        for b in range(B):
            pltpu.make_async_copy(
                bank_ref.at[tsel_ref[b, q]],
                slabs.at[slot, b],
                sems.at[slot, b],
            ).wait()

        acc = jnp.zeros((B, slabs.shape[3]), jnp.float32)
        if boolean:
            rc = jnp.zeros_like(acc)
            oc = jnp.zeros_like(acc)
            nc = jnp.zeros_like(acc)
        for t in range(Tq):
            # [B, 1, LANE] dynamic sublane slice -> [B, LANE]
            row = slabs[slot, :, pl.ds(cidx_ref[t, q], 1), :][:, 0, :]
            if boolean:
                fl = flags_ref[t, q]
                present = jnp.where(
                    row > 0, jnp.float32(1.0), jnp.float32(0.0)
                )
                zero = jnp.zeros_like(row)
                acc = acc + jnp.where((fl & 1) != 0, row, zero)
                rc = rc + jnp.where((fl & 2) != 0, present, zero)
                oc = oc + jnp.where((fl & 4) != 0, present, zero)
                nc = nc + jnp.where((fl & 8) != 0, present, zero)
            else:
                acc = acc + row
        s_ref[0] = acc
        if boolean:
            r_ref[0] = rc
            o_ref[0] = oc
            n_ref[0] = nc

    return kernel


# ---------------------------------------------------------------------------
# Union (sorted-pair) rescore: one DMA per DISTINCT selected tile
# ---------------------------------------------------------------------------

UNION_PB = 8  # pairs per grid step
UNION_NSLOT = 2 * UNION_PB + 4  # slab ring >= slots two steps can span
# scalar-prefetch budget: the packed pair array is [P] i32 in SMEM (~1 MB
# total SMEM); cap the union path so pair metadata + cidx/flags fit
UNION_MAX_PAIRS = 64 << 10


def _mk_union_kernel(PB: int, Tq: int, boolean: bool, NSLOT: int):
    """Sorted-pair rescore step: processes PB pairs, DMAing each distinct
    tile slab ONCE into a ring of NSLOT VMEM slabs.

    Scalar operands:
      pair_ref [P] i32 — packed (slot << 12) | (q << 1) | is_new  (slot is
        the distinct-tile rank of the pair; is_new marks the slot's first
        pair, which owns the DMA wait)
      dtile_ref [NDIST_pad] i32 — tile id per distinct slot
      ilo/ihi [NSTEP] i32 — slot issue range for each step (prefetches one
        step ahead; ring capacity NSLOT >= 2*PB + 2 makes reuse safe: a
        slot s overwrites s - NSLOT, whose pairs were processed at least
        two steps earlier)
      cidx_ref [Tq, Q] (+ flags_ref [Tq, Q]) — clause rows per query
    """

    def kernel(*refs):
        if boolean:
            (pair_ref, dtile_ref, ilo_ref, ihi_ref, cidx_ref, flags_ref,
             bank_ref, s_ref, r_ref, o_ref, n_ref, slabs, sems) = refs
        else:
            (pair_ref, dtile_ref, ilo_ref, ihi_ref, cidx_ref,
             bank_ref, s_ref, slabs, sems) = refs
        k = pl.program_id(0)

        def issue(s, _):
            sl = jax.lax.rem(s, NSLOT)
            pltpu.make_async_copy(
                bank_ref.at[dtile_ref[s]], slabs.at[sl], sems.at[sl]
            ).start()
            return _

        jax.lax.fori_loop(ilo_ref[k], ihi_ref[k], issue, 0)

        for j in range(PB):
            word = pair_ref[k * PB + j]
            slot = word >> 12
            q = (word >> 1) & 0x7FF
            is_new = word & 1
            sl = jax.lax.rem(slot, NSLOT)

            @pl.when(is_new == 1)
            def _():
                pltpu.make_async_copy(
                    bank_ref.at[dtile_ref[slot]], slabs.at[sl], sems.at[sl]
                ).wait()

            acc = jnp.zeros((1, slabs.shape[2]), jnp.float32)
            if boolean:
                rc = jnp.zeros_like(acc)
                oc = jnp.zeros_like(acc)
                nc = jnp.zeros_like(acc)
            for t in range(Tq):
                row = slabs[sl, pl.ds(cidx_ref[t, q], 1), :]
                if boolean:
                    fl = flags_ref[t, q]
                    present = jnp.where(
                        row > 0, jnp.float32(1.0), jnp.float32(0.0)
                    )
                    zero = jnp.zeros_like(row)
                    acc = acc + jnp.where((fl & 1) != 0, row, zero)
                    rc = rc + jnp.where((fl & 2) != 0, present, zero)
                    oc = oc + jnp.where((fl & 4) != 0, present, zero)
                    nc = nc + jnp.where((fl & 8) != 0, present, zero)
                else:
                    acc = acc + row
            s_ref[j, :] = acc[0]
            if boolean:
                r_ref[j, :] = rc[0]
                o_ref[j, :] = oc[0]
                n_ref[j, :] = nc[0]

    return kernel


def union_rescore_supported(Q: int, B: int) -> bool:
    """Whether the sorted-pair union kernel can serve this batch shape:
    pair metadata must fit the SMEM scalar-prefetch budget, the packed
    word needs q < 2048, and the grid wants PB | Q*B."""
    P = Q * B
    return (
        P % UNION_PB == 0
        and P <= UNION_MAX_PAIRS
        and Q <= 2048
    )


def pallas_union_rescore(
    compact_t: jnp.ndarray,  # f32 [G, U8, LANE] tile-major compact bank
    cidx: jnp.ndarray,  # int32 [Q, Tq] compact row per clause (0 = zero row)
    tsel: jnp.ndarray,  # int32 [Q, B] selected tiles (ascending)
    flags: jnp.ndarray = None,  # int32 [Q, Tq] or None for pure-OR
    *,
    interpret: bool = False,
):
    """Same contract as pallas_gather_rescore (bit-identical accumulation
    per (query, tile)), but HBM traffic scales with the number of DISTINCT
    selected tiles instead of Q*B: the (query, tile) pairs are sorted by
    tile, each distinct tile's [U8, LANE] slab is DMA'd once, and every
    pair of that tile accumulates out of the same slab. A diverse 1M-doc
    mixed batch selects the same hot tiles ~4x over (measured: 28,672
    pairs -> 7,511 distinct tiles), so the per-(q,b) kernel re-read the
    bank ~4x; this is the WAND shared-block-access idea in batch form
    (WANDScorer.h:244-253 reuses one block across its pivot docs)."""
    G, U8, LANE = compact_t.shape
    Q, Tq = cidx.shape
    B = tsel.shape[1]
    P = Q * B
    boolean = flags is not None
    assert union_rescore_supported(Q, B)
    PB, NSLOT = UNION_PB, UNION_NSLOT
    NSTEP = P // PB

    ft = tsel.reshape(-1)
    order = jnp.argsort(ft, stable=True).astype(jnp.int32)  # sorted->orig
    st = ft[order]  # [P] sorted tiles
    sq = order // jnp.int32(B)  # [P] query of sorted pair
    new = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (st[1:] != st[:-1]).astype(jnp.int32),
        ]
    )
    slot = jnp.cumsum(new, dtype=jnp.int32) - 1  # [P] distinct-tile rank
    pair = (slot << 12) | (sq << 1) | new
    # distinct tile per slot: first sorted pair of each slot (slot is a
    # sorted array, so searchsorted finds that first pair; clamp padding)
    first = jnp.searchsorted(
        slot, jnp.arange(P, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    dtile = st[jnp.minimum(first, P - 1)]  # [P] (>=ndist entries unused)
    # per-step issue ranges: step k issues slots (ihi[k-1], ihi[k]] with
    # ihi[k] = 1 + last slot needed by step k+1 (one-step prefetch)
    last_slot = slot[PB - 1 :: PB]  # [NSTEP] last slot of each step
    ihi = jnp.concatenate([last_slot[1:], last_slot[-1:]]) + 1
    ilo = jnp.concatenate([jnp.zeros((1,), jnp.int32), ihi[:-1]])

    n_out = 4 if boolean else 1
    scalars = [pair, dtile, ilo, ihi, cidx.T]
    if boolean:
        scalars.append(flags.T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(NSTEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple(
            pl.BlockSpec((PB, LANE), lambda k, *_: (k, 0))
            for _ in range(n_out)
        ),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, U8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
    )
    outs = pl.pallas_call(
        _mk_union_kernel(PB, Tq, boolean, NSLOT),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((P, LANE), jnp.float32)
            for _ in range(n_out)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*scalars, compact_t)
    # un-permute sorted-pair rows back to [Q, B, LANE]
    inv = jnp.argsort(order).astype(jnp.int32)
    outs = tuple(o[inv].reshape(Q, B, LANE) for o in outs)
    return outs if boolean else outs[0]


def pallas_gather_rescore(
    compact_t: jnp.ndarray,  # f32 [G, U8, LANE] tile-major compact bank
    cidx: jnp.ndarray,  # int32 [Q, Tq] compact row per clause (0 = zero row)
    tsel: jnp.ndarray,  # int32 [Q, B] selected tiles (ascending)
    flags: jnp.ndarray = None,  # int32 [Q, Tq] or None for pure-OR
    *,
    interpret: bool = False,
):
    """scores f32 [Q, B, LANE]; boolean variant also returns req/sho/neg
    presence-count lanes (each [Q, B, LANE])."""
    G, U8, LANE = compact_t.shape
    Q, Tq = cidx.shape
    B = tsel.shape[1]
    boolean = flags is not None

    resident = 2 * U8 * B * LANE * 4 <= RESIDENT_VMEM_BUDGET
    if not resident:
        # B-chunked resident calls: accumulation is per (query, tile), so
        # splitting the tile axis changes nothing bit-wise; each chunk's
        # slab scratch fits the budget. Only huge-U8 banks (chunk < 16
        # tiles) fall back to the latency-bound DMA ring.
        bc = (RESIDENT_VMEM_BUDGET // (2 * U8 * LANE * 4)) or 1
        if bc >= RESIDENT_MIN_CHUNK and bc < B:
            parts = [
                pallas_gather_rescore(
                    compact_t, cidx, tsel[:, o : o + bc], flags,
                    interpret=interpret,
                )
                for o in range(0, B, bc)
            ]
            if boolean:
                return tuple(
                    jnp.concatenate([p[i] for p in parts], axis=1)
                    for i in range(4)
                )
            return jnp.concatenate(parts, axis=1)
    n_out = 4 if boolean else 1
    scalars = (
        (cidx.T, tsel.T, flags.T) if boolean else (cidx.T, tsel.T)
    )
    if resident:
        scratch = [
            pltpu.VMEM((2, B, U8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, B)),
        ]
        kernel = _mk_kernel_resident(B, Tq, boolean)
    else:
        scratch = [
            pltpu.VMEM((NSLOT, U8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ]
        kernel = _mk_kernel(B, Tq, boolean)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(Q,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple(
            pl.BlockSpec((1, B, LANE), lambda q, *_: (q, 0, 0))
            for _ in range(n_out)
        ),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((Q, B, LANE), jnp.float32)
            for _ in range(n_out)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*scalars, compact_t)
    return outs if boolean else outs[0]
