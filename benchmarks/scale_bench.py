#!/usr/bin/env python
"""Scale benchmark: OR-20 batched throughput at 1M+ docs (pruned path).

Mirrors bench.py's scale section but standalone, with knobs for batch
size / tile budget experiments. Prints one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.path.expanduser("~/.cache/diagon_tpu")
BASELINE_OR20_QPS = 1e6 / 165.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trial-batches", type=int, default=32)
    ap.add_argument("--b0", type=int, default=0, help="override prune_B0")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jax_cache")
    )
    log(f"jax backend: {jax.default_backend()}")

    import bench

    seg, _ = bench.build_or_load_segment(args.docs, fresh_stats=False)
    log(f"segment: {seg.num_docs} docs")

    from diagon_tpu.bench.queries import REUTERS_QUERIES
    from diagon_tpu.search.searcher import IndexSearcher

    t0 = time.time()
    s = IndexSearcher([seg])
    or20 = REUTERS_QUERIES["or20"]
    Q = args.batch
    b = [or20] * Q
    if args.b0:
        ctx = s._ctx("body")
        for ex in ctx.row_executors:
            if ex is not None:
                ex.prune_B0 = args.b0
    h = s.dispatch_batch(b, 10)
    res = s.collect_batch(h)
    log(f"setup (load+compile): {time.time() - t0:.1f}s")

    if not args.skip_parity:
        from diagon_tpu.search.oracle import OracleSearcher

        t0 = time.time()
        want = OracleSearcher([seg]).search(or20, 10)
        got = res[0]
        assert got.doc_ids() == want.doc_ids(), "parity FAIL (docids)"
        assert got.total_hits == want.total_hits, "parity FAIL (hits)"
        for o, d in zip(want.score_docs, got.score_docs):
            assert o.score == d.score, (o, d)
        log(f"parity: bit-exact ({time.time() - t0:.1f}s)")

    def trial(n):
        t0 = time.perf_counter()
        hs = [s.dispatch_batch(b, 10) for _ in range(n)]
        _, _, parts = hs[-1]
        np.asarray(parts[-1][2][0, 0])
        return (time.perf_counter() - t0) / n

    ts = [trial(args.trial_batches) for _ in range(args.iters)]
    qps = Q / min(ts)
    log(f"trials ms/batch: {[round(t * 1e3, 2) for t in ts]}")
    print(
        json.dumps(
            {
                "metric": f"or20_{args.docs}_throughput",
                "value": round(qps),
                "unit": "qps",
                "vs_baseline": round(qps / BASELINE_OR20_QPS, 2),
                "batch": Q,
            }
        )
    )


if __name__ == "__main__":
    main()
