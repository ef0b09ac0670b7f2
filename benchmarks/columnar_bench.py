#!/usr/bin/env python
"""ClickBench-style columnar benchmark (reference: clickbench_benchmark.cpp
+ benchmarks/columnar/ColumnarStore.h).

Synthetic hits-like table; measures granule-pruned range scans and
aggregations on device, plus compression ratios, against a numpy oracle.
Run: python benchmarks/columnar_bench.py [--rows 1000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_table(rows: int, seed: int = 11):
    from diagon_tpu.columnar import ColumnarTable, Float64Column, Int64Column

    rng = np.random.Generator(np.random.PCG64(seed))
    t = ColumnarTable()
    # event-time: sorted (the classic MergeTree ORDER BY) -> prunable
    t.add_column("event_ts", Int64Column(np.sort(rng.integers(0, 1 << 22, rows))))
    t.add_column("user_id", Int64Column(rng.integers(0, 100000, rows)), minmax=True)
    t.add_column("duration", Float64Column(rng.gamma(2.0, 150.0, rows)))
    t.add_column("region", Int64Column(rng.integers(0, 16, rows)), minmax=False)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from diagon_tpu.columnar import DeviceTable, read_table, write_table
    from diagon_tpu.store import RAMDirectory

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    table = build_table(args.rows)
    log(f"build: {time.time() - t0:.1f}s rows={table.num_rows} "
        f"granules={table.num_granules}")

    # compression / store round-trip
    d = RAMDirectory()
    t0 = time.time()
    write_table(d, "hits", table)
    raw = sum(
        c.values.nbytes for c in table.columns.values() if hasattr(c, "values")
    )
    stored = d.file_length("hits.col")
    log(f"store: {time.time() - t0:.1f}s raw={raw/1e6:.1f}MB "
        f"compressed={stored/1e6:.1f}MB ratio={raw/stored:.1f}x")

    dt = DeviceTable(table)
    ts = table.columns["event_ts"].values
    dur = table.columns["duration"].values

    queries = {
        "narrow_range_agg": dict(
            filter_col="event_ts", lower=1 << 20, upper=(1 << 20) + (1 << 16),
            agg_col="duration",
        ),
        "wide_range_agg": dict(
            filter_col="event_ts", lower=0, upper=1 << 21, agg_col="duration"
        ),
        "point_user": dict(filter_col="user_id", lower=777, upper=777),
    }

    results = {}
    for name, kw in queries.items():
        got = dt.range_agg(**kw)  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            got = dt.range_agg(**kw)
            times.append(time.perf_counter() - t0)
        # oracle check
        col = table.columns[kw["filter_col"]].values
        mask = (col >= kw["lower"]) & (col <= kw["upper"])
        assert got["count"] == int(mask.sum()), name
        p50 = float(np.percentile(times, 50) * 1e3)
        results[name] = {
            "p50_ms": round(p50, 3),
            "count": got["count"],
            "granules_scanned": got["granules_scanned"],
            "granules_total": got["granules_total"],
        }
        log(f"{name}: p50={p50:.2f}ms count={got['count']} "
            f"granules={got['granules_scanned']}/{got['granules_total']}")

    # group-by
    g = dt.range_group_agg("event_ts", "region", 16, lower=0,
                           upper=1 << 21, agg_col="duration")
    log(f"group_by region: count={g['count']} "
        f"top_group={int(np.argmax(g['group_counts']))}")

    print(json.dumps({"metric": "columnar_narrow_range_p50_ms",
                      "value": results["narrow_range_agg"]["p50_ms"],
                      "unit": "ms"}))


if __name__ == "__main__":
    main()
