#!/usr/bin/env python
"""Phase profiler for the mixed-batch pruned path at scale.

Measures, on the live backend, per-dispatch device time of:
  - or20 homogeneous batch (the headline reference point)
  - the mixed batch's pure-OR subset alone
  - the mixed batch's boolean subset alone
  - the full mixed batch (purity split + merge)
  - phase 1 alone (pallas approx select) for each subset

so the mixed-vs-or20 gap (22.9x vs 8.8x at 1M docs, RESULTS.md r3)
attributes to a phase instead of a guess. Usage:
  python scripts/profile_mixed.py [--docs 1000000] [--batch 1024]
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
    """min device ms per dispatch over chained runs."""
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
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=160)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jax_cache")
    )
    log(f"backend={jax.default_backend()}")

    import bench
    from diagon_tpu.bench.queries import (
        REUTERS_QUERIES,
        frequent_terms,
        mixed_query_batch,
    )
    from diagon_tpu.search.searcher import IndexSearcher

    seg, _ = bench.build_or_load_segment(args.docs, fresh_stats=False)
    s = IndexSearcher([seg])
    Q = args.batch

    def bench_batch(tag, batch):
        h = s.dispatch_batch(batch, 10)
        s.collect_batch(h)  # warm + compile

        def dispatch():
            return s.dispatch_batch(batch, 10)

        def probe(h):
            _, _, parts = h
            np.asarray(parts[-1][2][0, 0])

        ms = chain_time(dispatch, probe)
        log(f"{tag:>28}: {ms:8.2f} ms/batch  "
            f"({len(batch) / ms * 1e3:,.0f} qps)")
        return ms

    or20 = REUTERS_QUERIES["or20"]
    bench_batch("or20 x Q (homogeneous)", [or20] * Q)

    pool = frequent_terms(s, "body", args.pool)
    mixed = mixed_query_batch(pool, n=Q, seed=42)
    from diagon_tpu.search.query import BooleanQuery

    def is_pure_or(q):
        if not isinstance(q, BooleanQuery):
            return True
        from diagon_tpu.search.query import Occur

        return all(c.occur == Occur.SHOULD for c in q.clauses)

    ors = [q for q in mixed if is_pure_or(q)]
    bools = [q for q in mixed if not is_pure_or(q)]
    log(f"mixed composition: {len(ors)} pure-OR, {len(bools)} boolean")

    bench_batch("mixed full (split+merge)", mixed)
    bench_batch("mixed pure-OR subset", ors)
    bench_batch("mixed boolean subset", bools)

    # wider/narrower variants isolate phase-1 (vocab-driven) vs phase-2
    # (tile-budget-driven) costs without internal plumbing: a batch of
    # or20 copies shares the boolean subsets' SIZE but has tiny vocab
    if bools:
        bench_batch("or20 x len(bools) control", [or20] * len(bools))
    if ors:
        bench_batch("or20 x len(ors) control", [or20] * len(ors))

    from diagon_tpu.observability.metrics import registry

    snap = {k: v for k, v in registry.snapshot().items()
            if k.startswith("search.")}
    log(f"pruning counters: {snap}")
    log("done")


if __name__ == "__main__":
    main()
