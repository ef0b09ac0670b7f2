#!/usr/bin/env python
"""Scale benchmark: OR-20 + mixed-batch throughput at 1M/10M docs.

One scale tier per process: bench.py runs this as a capped subprocess so
each tier gets a clean HBM (a 10M-doc tier sharing a process with the
1M tier's banks OOMs a 16 GB chip — the round-3 RESOURCE_EXHAUSTED).
Standalone use keeps knobs for batch size / tile budget experiments.

Prints up to TWO JSON lines to stdout — an interim or20-only line as
soon as the or20 phase finishes (so a caller's subprocess timeout during
the mixed phase can still recover the tier), then the full line:
  {"or20_qps": N, "or20_vs_baseline": N, "mixed_qps": N,
   "mixed_vs_baseline": N, "parity": "bit-exact"}
Consumers must take the LAST JSON line (bench.py does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diagon_tpu.bench.cache import bench_cache_dir

CACHE_DIR = bench_cache_dir()
BASELINE_OR20_QPS = 1e6 / 165.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _mem_gb(jax) -> str:
    try:
        st = jax.local_devices()[0].memory_stats()
        return (f"{st['bytes_in_use'] / 2**30:.2f} GiB in use / "
                f"{st.get('bytes_limit', 0) / 2**30:.2f} limit")
    except Exception:
        return "n/a"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trial-batches", type=int, default=32)
    ap.add_argument("--b0", type=int, default=0, help="override prune_B0")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-mixed", action="store_true")
    ap.add_argument("--mixed-pool", type=int, default=0,
                    help="term pool for the mixed batch (0 = auto: 160, "
                    "shrunk at 10M docs where the pool's banks must fit "
                    "HBM; the reference's own query tables are a few "
                    "dozen fixed terms, reuters_benchmark.cpp:193-268)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jax_cache")
    )
    # tiny per-shape ops (concatenate/dynamic_slice, ~0.4 s each) dodge the
    # default 1.0 s persistence threshold and recompile EVERY run — dozens
    # per cold batch across partition groups
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"jax backend: {jax.default_backend()}")

    import bench

    seg, _ = bench.build_or_load_segment(args.docs, fresh_stats=False)
    log(f"segment: {seg.num_docs} docs")

    from diagon_tpu.bench.queries import (
        REUTERS_QUERIES,
        frequent_terms,
        mixed_query_batch,
    )
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.searcher import IndexSearcher

    t0 = time.time()
    # query_cache=False: measured qps re-scores every dispatch (the
    # reference's bench loop re-runs full WAND scoring per iteration)
    s = IndexSearcher([seg], query_cache=False)
    oracle = OracleSearcher([seg])
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
    log(f"setup (load+compile): {time.time() - t0:.1f}s; mem {_mem_gb(jax)}")

    out = {"docs": seg.num_docs, "batch": Q}
    if not args.skip_parity:
        t0 = time.time()
        bench.batch_parity(s, oracle, b, res, [0], tag="or20", seg=seg)
        log(f"parity: or20 bit-exact ({time.time() - t0:.1f}s)")
        out["parity"] = "bit-exact"

    def trial(batch, n):
        t0 = time.perf_counter()
        hs = [s.dispatch_batch(batch, 10) for _ in range(n)]
        _, _, parts = hs[-1]
        np.asarray(parts[-1][2][0, 0])
        return (time.perf_counter() - t0) / n

    ts = [trial(b, args.trial_batches) for _ in range(args.iters)]
    qps = Q / min(ts)
    log(f"or20 trials ms/batch: {[round(t * 1e3, 2) for t in ts]}")
    out["or20_qps"] = round(qps)
    out["or20_vs_baseline"] = round(qps / BASELINE_OR20_QPS, 2)
    # interim line: if the mixed phase below blows the caller's subprocess
    # cap (compile + OOM retries at 10M), the or20 tier result is already
    # on stdout for bench.py to recover
    print(json.dumps(out), flush=True)

    if not args.skip_mixed:
        # the batch's vocabulary banks (~10 B/doc/row) must fit HBM next
        # to the index; at 10M docs a 16 GB chip holds the index plus ONE
        # modest compact bank, so the mixed pool shrinks until one bank
        # covers the whole batch (partitioned groups would thrash the LRU
        # — every dispatch rebuilds every group's banks) and an OOM
        # retries with a smaller pool instead of failing the phase
        import gc

        huge = seg.num_docs >= 4 << 20
        pools = (
            [args.mixed_pool] if args.mixed_pool
            else ([32] if huge else [160])
        )
        for pool_n in pools:
            try:
                ctx = s._ctx("body")
                for ex in ctx.row_executors:
                    if ex is not None:
                        ex._batch_cache.clear()
                        ex._batch_bytes = 0
                        if huge:
                            # one group must admit the whole mixed vocab:
                            # pool + light/phrase rows + zero row
                            ex.COMPACT_GROUP_BYTES = 7 << 30
                            # on-demand entries use ON_DEMAND_CACHE_BUDGET
                            # (7 GB default); keep the legacy attr for the
                            # non-on-demand path at 4-10M doc sizes
                            ex.BATCH_CACHE_BUDGET = 7 << 30
                gc.collect()
                log(f"mem before mixed: {_mem_gb(jax)}")
                pool = frequent_terms(s, "body", pool_n)
                mixed = mixed_query_batch(pool, n=Q, seed=42)
                hm = s.dispatch_batch(mixed, 10)
                mres = s.collect_batch(hm)
                if not args.skip_parity:
                    bench.batch_parity(
                        s, oracle, mixed, mres,
                        list(range(0, Q, max(1, Q // 8))), tag="mixed",
                        seg=seg,
                    )
                    log("parity: mixed sample bit-exact")
                ts = [
                    trial(mixed, max(8, args.trial_batches // 2))
                    for _ in range(max(3, args.iters - 1))
                ]
                mqps = Q / min(ts)
                log(f"mixed trials ms/batch (pool {pool_n}): "
                    f"{[round(t * 1e3, 2) for t in ts]}")
                out["mixed_qps"] = round(mqps)
                out["mixed_vs_baseline"] = round(mqps / BASELINE_OR20_QPS, 2)
                out["mixed_pool"] = pool_n
                break
            except Exception as exc:  # the or20 result must still print
                log(f"mixed phase (pool {pool_n}) FAILED: {exc!r:.300}")
                out["mixed_error"] = str(exc)[:120]
                out.pop("mixed_qps", None)

    from diagon_tpu.observability.metrics import registry

    counters = {
        k: v for k, v in registry.snapshot().items()
        if k.startswith("search.")
    }
    log(f"pruning counters: {json.dumps(counters)}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
