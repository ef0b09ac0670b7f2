#!/usr/bin/env python
"""Minimal repro for the 10M mixed-tier remote-compile crash.

The scale_bench 10M mixed phase dies in tpu_compile_helper (HTTP 500,
subprocess exit 1) while or20 at the same scale compiles fine. The
difference is only SHAPES: or20 dedupes to Q=8, mixed dispatches a
pure-OR subset (~Q=896) and a boolean subset (~Q=256) at D=10,002,432.
This script compiles each pruned-batch kernel variant at those shapes
with synthetic data, one at a time, to isolate the failing program.

Usage: python scripts/repro_mixed10m_compile.py [--step N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diagon_tpu.bench.cache import bench_cache_dir

CACHE_DIR = bench_cache_dir()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--u8", type=int, default=40)
    ap.add_argument("--steps", type=str, default="or,bool2,bool4",
                    help="comma list: or,bool2,bool4 (phase1+2 each)")
    ap.add_argument("--q-or", type=int, default=896)
    ap.add_argument("--q-bool", type=int, default=256)
    ap.add_argument("--tq", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jax_cache")
    )
    log(f"backend={jax.default_backend()}")

    from diagon_tpu.search.row_engine import (
        LANE,
        _pruned_batch_phase1,
        _pruned_batch_phase2,
    )

    D = -(-args.docs // 4096) * 4096
    G = D // LANE
    U8 = args.u8
    rng = np.random.Generator(np.random.PCG64(7))

    t0 = time.time()
    compact_bf16 = jnp.asarray(
        rng.random((U8, D), np.float32), jnp.bfloat16
    )
    compact_t = jnp.asarray(
        np.asarray(compact_bf16, np.float32).reshape(U8, G, LANE)
    ).transpose(1, 0, 2)
    live = jnp.ones((D,), jnp.float32)
    compact_t.block_until_ready()
    log(f"banks ready D={D} G={G} U8={U8} ({time.time() - t0:.1f}s)")

    def indicators(Q, kind):
        a_sc = rng.integers(0, 2, (U8, Q)).astype(np.float32)
        if kind == "or":
            a_rq = np.zeros((U8, Q), np.float32)
            a_sh = a_sc
        else:
            a_rq = rng.integers(0, 2, (U8, Q)).astype(np.float32)
            a_sh = np.where(a_rq > 0, 0.0, a_sc)
        a_ng = np.zeros((U8, Q), np.float32)
        params = np.zeros((8, Q), np.float32)
        params[0] = a_rq.sum(0)
        params[1] = np.minimum(1, a_sh.sum(0))
        bf = lambda x: jnp.asarray(x, jnp.bfloat16)
        a_cb = bf(a_rq * 256.0 + a_sh)
        return (bf(a_sc), bf(a_rq), bf(a_sh), bf(a_ng),
                jnp.asarray(params), a_cb)

    def run(tag, Q, boolean, use_cb):
        a_sc, a_rq, a_sh, a_ng, params, a_cb = indicators(
            Q, "bool" if boolean else "or"
        )
        smem_cap = max(32, (512 << 10) // (4 * Q))
        B = min(G, smem_cap, max(32, 2, G // 512))
        log(f"--- {tag}: Q={Q} B={B} boolean={boolean} "
            f"a_cb={'y' if use_cb else 'n'}")
        t0 = time.time()
        tsel, u_next, min_unsel, hits = _pruned_batch_phase1(
            compact_bf16, a_sc, a_rq, a_sh, a_ng, params, live,
            Bk=B, boolean=boolean, interpret=False,
            a_cb_t=a_cb if use_cb else None,
        )
        tsel.block_until_ready()
        log(f"    phase1 ok ({time.time() - t0:.1f}s)")
        Tq = args.tq
        cidx = jnp.asarray(
            rng.integers(0, U8, (Q, Tq)).astype(np.int32)
        )
        cflags = jnp.asarray(
            np.full((Q, Tq), 1 + 4, np.int32)
        )
        bool_params = jnp.asarray(
            np.zeros((Q, 2), np.float32)
        )
        t0 = time.time()
        fused = _pruned_batch_phase2(
            compact_t, cidx, cflags, live, tsel, u_next, min_unsel,
            hits, bool_params, k=10, boolean=boolean, interpret=False,
        )
        fused.block_until_ready()
        log(f"    phase2 ok ({time.time() - t0:.1f}s)")

    steps = args.steps.split(",")
    if "or" in steps:
        run("pure-OR subset", args.q_or, False, False)
    if "bool2" in steps:
        run("boolean subset (fused 2-matmul)", args.q_bool, True, True)
    if "bool4" in steps:
        run("boolean subset (4-product)", args.q_bool, True, False)
    log("ALL STEPS PASSED")


if __name__ == "__main__":
    main()
