#!/usr/bin/env python
"""Perf-trend history: append a bench JSON result and gate on regressions.

Mirrors the reference's daily perf automation
(`/root/reference/.github/workflows/performance_benchmarks.yml` +
`/root/reference/scripts/check_fst_regression.py`, which append to
`performance_history/` and fail CI on a drop vs the recorded best) as a
single local harness:

    python scripts/perf_trend.py record BENCH_r04.json     # append + check
    python scripts/perf_trend.py record '{"metric": ...}'  # inline JSON
    python scripts/perf_trend.py check                     # gate only
    python scripts/perf_trend.py report                    # history table

History lives in `benchmarks/performance_history.jsonl` (one JSON object
per run: ts + the tracked metrics). `record` exits non-zero if any tracked
metric regressed more than --tolerance (default 20%) vs the best recorded
value, same contract as the reference's regression gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HISTORY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "performance_history.jsonl",
)

# metric -> (json path candidates, higher_is_better)
TRACKED = {
    "or20_qps": (["value"], True),
    "mixed_qps": (["mixed_qps"], True),
    "phrase_qps": (["phrase_qps"], True),
    "or20_1m_qps": (["or20_1m_qps"], True),
    "mixed_1m_qps": (["mixed_1m_qps"], True),
    "or20_10m_qps": (["or20_10m_qps"], True),
    "mixed_10m_qps": (["mixed_10m_qps"], True),
    "docs_per_s": (["docs_per_s", "extras.indexing.docs_per_s"], True),
    "sparse_top10_qps": (
        ["extras.sparse.value", "sparse_top10_qps", "sparse_qps"], True),
    "columnar_q9_device_us": (
        ["extras.columnar.value", "columnar_q9_device_us",
         "columnar_q9_us"], False),
}


def _get(obj, dotted):
    cur = obj
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def extract(bench: dict) -> dict:
    # driver BENCH_rN.json files wrap the bench line under "parsed"
    if "parsed" in bench and isinstance(bench["parsed"], dict):
        bench = bench["parsed"]
    out = {}
    for name, (paths, _) in TRACKED.items():
        for p in paths:
            v = _get(bench, p)
            if isinstance(v, (int, float)):
                out[name] = float(v)
                break
    return out


def load_history() -> list:
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as f:
        return [json.loads(line) for line in f if line.strip()]


def best_so_far(history: list) -> dict:
    best = {}
    for run in history:
        for name, (_, hib) in TRACKED.items():
            v = run.get(name)
            if v is None:
                continue
            cur = best.get(name)
            if cur is None or (v > cur if hib else v < cur):
                best[name] = v
    return best


def check(entry: dict, best: dict, tolerance: float) -> list:
    """Return list of (metric, value, best, pct_drop) regressions."""
    regs = []
    for name, (_, hib) in TRACKED.items():
        v, b = entry.get(name), best.get(name)
        if v is None or b is None or b == 0:
            continue
        drop = (b - v) / b if hib else (v - b) / b
        if drop > tolerance:
            regs.append((name, v, b, drop * 100))
    return regs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["record", "check", "report"])
    ap.add_argument("source", nargs="?", default=None,
                    help="bench JSON file path or inline JSON string")
    ap.add_argument("--tolerance", type=float, default=0.20,
                    help="max fractional drop vs best before failing")
    ap.add_argument("--no-gate", action="store_true",
                    help="record without failing on regression")
    args = ap.parse_args()

    history = load_history()

    if args.mode == "report":
        best = best_so_far(history)
        print(f"{len(history)} runs in {HISTORY}")
        for name in TRACKED:
            vals = [r[name] for r in history if name in r]
            if not vals:
                continue
            print(f"  {name:>24}: last={vals[-1]:>12,.1f} "
                  f"best={best[name]:>12,.1f} runs={len(vals)}")
        return 0

    src = args.source
    if src is None:
        src = sys.stdin.read()
    if os.path.exists(src):
        with open(src) as f:
            bench = json.load(f)
    else:
        bench = json.loads(src)
    entry = extract(bench)
    if not entry:
        print("perf_trend: no tracked metrics in input", file=sys.stderr)
        return 2

    best = best_so_far(history)
    regs = check(entry, best, args.tolerance)

    if args.mode == "record":
        entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
        with open(HISTORY, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(f"recorded {len(entry) - 1} metrics -> {HISTORY}")

    for name, v, b, pct in regs:
        print(f"REGRESSION {name}: {v:,.1f} vs best {b:,.1f} "
              f"(-{pct:.1f}% > {args.tolerance * 100:.0f}%)",
              file=sys.stderr)
    if regs and not args.no_gate:
        return 1
    if not regs:
        print("no regressions vs recorded best")
    return 0


if __name__ == "__main__":
    sys.exit(main())
