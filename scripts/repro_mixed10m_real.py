#!/usr/bin/env python
"""Reproduce the 10M mixed-tier compile crash on the real segment with
jax_log_compiles on, so the last logged compile names the failing
program. Usage: python scripts/repro_mixed10m_real.py [--pool 32]"""

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
    ap.add_argument("--pool", type=int, default=32)
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jax_cache")
    )
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)
    log(f"backend={jax.default_backend()}")

    import bench
    from diagon_tpu.bench.queries import frequent_terms, mixed_query_batch
    from diagon_tpu.search.searcher import IndexSearcher

    seg, _ = bench.build_or_load_segment(args.docs, fresh_stats=False)
    s = IndexSearcher([seg])
    ctx = s._ctx("body")
    for ex in ctx.row_executors:
        if ex is not None:
            ex.COMPACT_GROUP_BYTES = 7 << 30
            ex.BATCH_CACHE_BUDGET = 7 << 30
    pool = frequent_terms(s, "body", args.pool)
    mixed = mixed_query_batch(pool, n=args.batch, seed=42)
    log(f"dispatching mixed batch ({len(mixed)} queries, pool {args.pool})")
    t0 = time.time()
    h = s.dispatch_batch(mixed, 10)
    res = s.collect_batch(h)
    log(f"mixed dispatch+collect OK ({time.time() - t0:.1f}s), "
        f"hits[0]={res[0].total_hits}")


if __name__ == "__main__":
    main()
