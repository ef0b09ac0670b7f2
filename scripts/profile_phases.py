#!/usr/bin/env python
"""Per-phase device profiler for the pruned batch path at scale.

Splits one dispatch of a (sub)batch into its device programs and times
each by chained dispatch + one probe (tunnel-safe):

  - approx kernel alone (pallas_approx_select[_bool2/_bool])
  - phase 1 program (approx kernel + top-B tile selection)
  - phase 2 program (gather-rescore + finish)
  - the full executor dispatch (what the bench measures)

so a scale-tier wall (e.g. 10M mixed at 129 ms/batch) attributes to a
specific program instead of a guess.  Usage:
  python scripts/profile_phases.py --docs 10000000 --pool 32
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


def chain_time(dispatch, probe, n=16, trials=4):
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = dispatch()
        probe(out)
        ts.append((time.perf_counter() - t0) / n)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=0,
                    help="0 = auto (32 at >=4M docs else 160)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"backend={jax.default_backend()}")

    import bench
    from diagon_tpu.bench.queries import frequent_terms, mixed_query_batch
    from diagon_tpu.search import row_engine as re_mod
    from diagon_tpu.search.searcher import IndexSearcher

    seg, _ = bench.build_or_load_segment(args.docs, fresh_stats=False)
    s = IndexSearcher([seg], query_cache=False)
    huge = seg.num_docs >= 4 << 20
    ctx = s._ctx("body")
    for ex in ctx.row_executors:
        if ex is not None and huge:
            ex.COMPACT_GROUP_BYTES = 7 << 30
            ex.BATCH_CACHE_BUDGET = 7 << 30
    pool_n = args.pool or (32 if huge else 160)
    pool = frequent_terms(s, "body", pool_n)
    mixed = mixed_query_batch(pool, n=args.batch, seed=42)

    # warm the full path once (builds the compact banks + compiles)
    t0 = time.time()
    h = s.dispatch_batch(mixed, 10)
    s.collect_batch(h)
    log(f"warm dispatch+collect: {time.time() - t0:.1f}s")

    def probe_fused(f):
        np.asarray(f[0, 0])

    ms = chain_time(lambda: s.dispatch_batch(mixed, 10),
                    lambda h: probe_fused(h[2][-1][2]))
    log(f"full mixed batch: {ms:8.2f} ms/batch "
        f"({args.batch / ms * 1e3:,.0f} qps)")

    # reach the executor's split subsets the way dispatch() does
    flat = [s._cached_query_plans(q) for q in mixed]
    ex = ctx.row_executors[0]
    plans = [seg_plans[0] for _, seg_plans in flat]
    subsets = {"pure_or": [p for p in plans if p.pure_or],
               "boolean": [p for p in plans if not p.pure_or]}

    for tag, sub in subsets.items():
        if not sub:
            continue
        padded, orig_q = ex._pad_batch(sub)
        entry = ex._entry(padded)[1]
        compact = entry[-1]
        bool_params = entry[6]
        if compact is None:
            log(f"{tag}: no compact bank (exhaustive fallback)")
            continue
        idx = ex.index
        G = idx.num_docs_pad // re_mod.LANE
        smem_cap = max(32, (512 << 10) // (4 * max(len(padded), 1)))
        B = min(G, smem_cap,
                max(ex.prune_B0, -(-10 // re_mod.LANE) + 1, G // 512))
        boolean = not all(p.pure_or for p in padded)
        U8 = compact.compact_bf16.shape[0]
        log(f"{tag}: Q={len(padded)} (orig {orig_q}) U8={U8} G={G} B={B} "
            f"boolean={boolean}")

        from diagon_tpu.ops.pallas.approx_pass import (
            pallas_approx_select,
            pallas_approx_select_bool,
            pallas_approx_select_bool2,
        )

        if boolean and compact.a_cb_t is not None:
            approx = jax.jit(lambda: pallas_approx_select_bool2(
                compact.a_sc_t, compact.a_cb_t, compact.compact_bf16,
                compact.params_t, idx.live))
        elif boolean:
            approx = jax.jit(lambda: pallas_approx_select_bool(
                compact.a_sc_t, compact.a_rq_t, compact.a_sh_t,
                compact.a_ng_t, compact.compact_bf16, compact.params_t,
                idx.live))
        else:
            approx = jax.jit(lambda: pallas_approx_select(
                compact.a_sc_t, compact.compact_bf16, idx.live))
        approx()  # compile
        ms = chain_time(approx, lambda out: np.asarray(out[1][0]))
        log(f"{tag:>10} approx kernel : {ms:8.2f} ms")

        def p1():
            return re_mod._pruned_batch_phase1(
                compact.compact_bf16, compact.a_sc_t, compact.a_rq_t,
                compact.a_sh_t, compact.a_ng_t, compact.params_t,
                idx.live, Bk=B, boolean=boolean, interpret=False,
                a_cb_t=compact.a_cb_t,
            )

        out1 = jax.block_until_ready(p1())
        ms = chain_time(p1, lambda o: np.asarray(o[1][0]))
        log(f"{tag:>10} phase 1 (sel) : {ms:8.2f} ms")

        def p2():
            return re_mod._pruned_batch_phase2(
                compact.compact_t, compact.cidx, compact.cflags,
                idx.live, *out1, bool_params, k=10, boolean=boolean,
                interpret=False,
            )

        jax.block_until_ready(p2())
        ms = chain_time(p2, lambda o: np.asarray(o[0, 0]))
        log(f"{tag:>10} phase 2       : {ms:8.2f} ms")

        def full():
            return ex.dispatch(sub, 10)

        full()
        ms = chain_time(full, lambda o: np.asarray(o[0, 0]))
        log(f"{tag:>10} executor path : {ms:8.2f} ms")

    log("done")


if __name__ == "__main__":
    main()
