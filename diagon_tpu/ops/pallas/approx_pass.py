"""Pallas fused approx-scoring pass: matmul + tile-max + match-count.

Phase 1 of the pruned batch kernel (row_engine.row_score_topk_approx_or)
needs, for every (query, 128-doc tile): the maximum approximate score and
the count of live matching docs. Done in XLA this materializes the [Q, D]
approx matrix in HBM three times (matmul out, max reduce, count reduce) —
~1.5 GB per 128-query batch at 1M docs. This kernel keeps each [Q, CHUNK]
product block in VMEM and writes only the [G, Q] reductions, so HBM
traffic collapses to one read of the bf16 bank.

Layout notes: TPU blocks want trailing dims (8k, 128m); the indicator
matrix arrives TRANSPOSED ([H8, Q], H8 = H padded to a multiple of 8) and
outputs are [G, Q] so Q=batch rides the 128-lane axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _chunk_for(D: int) -> int:
    for c in (4096, 2048, 1024):
        if D % c == 0:
            return c
    raise ValueError(f"D={D} must be a multiple of 1024")


def _kernel(at_ref, bank_ref, live_ref, tmax_ref, cnt_ref):
    # at_ref [H8, Q] bf16, bank_ref [H8, CHUNK] bf16 -> ap [Q, CHUNK] f32
    ap = jax.lax.dot_general(
        at_ref[...],
        bank_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = ap.shape[0]
    g = ap.reshape(q, -1, 128)
    lv = live_ref[...].reshape(1, -1, 128)
    match = (g > 0) & (lv > 0)
    tmax_ref[...] = jnp.max(g, axis=2).T  # [nG, Q]
    cnt_ref[...] = jnp.sum(match, axis=2, dtype=jnp.int32).T


def _kernel_two_banks(
    at_ref, bank_ref, alt_ref, lbank_ref, live_ref, tmax_ref, cnt_ref
):
    ap = jax.lax.dot_general(
        at_ref[...],
        bank_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ap = ap + jax.lax.dot_general(
        alt_ref[...],
        lbank_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = ap.shape[0]
    g = ap.reshape(q, -1, 128)
    lv = live_ref[...].reshape(1, -1, 128)
    match = (g > 0) & (lv > 0)
    tmax_ref[...] = jnp.max(g, axis=2).T
    cnt_ref[...] = jnp.sum(match, axis=2, dtype=jnp.int32).T


def pallas_approx_pass(
    a_t: jnp.ndarray,  # bf16 [H8, Q] transposed clause-indicator matrix
    bank: jnp.ndarray,  # bf16 [H8, D]
    live: jnp.ndarray,  # f32 [D]
    a_light_t: jnp.ndarray = None,  # bf16 [L8, Q] or None
    light_bank: jnp.ndarray = None,  # bf16 [L8, D] or None
    *,
    interpret: bool = False,
):
    """(tile_max f32 [Q, G], match_count i32 [Q, G]) with G = D/128."""
    H8, Q = a_t.shape
    _, D = bank.shape
    chunk = _chunk_for(D)
    S = D // 128
    n = D // chunk
    ng = chunk // 128
    live2 = live.reshape(S, 128)

    two = a_light_t is not None
    in_specs = [
        pl.BlockSpec((H8, Q), lambda c: (0, 0)),
        pl.BlockSpec((H8, chunk), lambda c: (0, c)),
    ]
    args = [a_t, bank]
    if two:
        L8 = a_light_t.shape[0]
        in_specs += [
            pl.BlockSpec((L8, Q), lambda c: (0, 0)),
            pl.BlockSpec((L8, chunk), lambda c: (0, c)),
        ]
        args += [a_light_t, light_bank]
    in_specs.append(pl.BlockSpec((ng, 128), lambda c: (c, 0)))
    args.append(live2)

    tmax_t, cnt_t = pl.pallas_call(
        _kernel_two_banks if two else _kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((ng, Q), lambda c: (c, 0)),
            pl.BlockSpec((ng, Q), lambda c: (c, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, Q), jnp.float32),
            jax.ShapeDtypeStruct((S, Q), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*args)
    return tmax_t.T, cnt_t.T
