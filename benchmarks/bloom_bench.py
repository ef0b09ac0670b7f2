"""Bloom filter benchmark (reference ``benchmarks/BloomFilterBenchmark.cpp``).

Mirrors its three measurements: filter build throughput, membership-probe
throughput, and the measured false-positive rate at the configured
bits/element (the reference sweeps bits_per_elem and num_hashes;
BloomIndex fixes the columnar-granule configuration, so this reports
that operating point). Prints ONE JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--probes", type=int, default=100_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from diagon_tpu.columnar.table import BLOOM_WORDS, BloomIndex, hash_bytes64

    rng = np.random.Generator(np.random.PCG64(17))
    # distinct member keys, hashed the way the columnar layer hashes them
    members = np.asarray(
        [hash_bytes64(f"user{i}".encode()) for i in range(args.rows // 100)],
        dtype=np.uint64,
    )
    hashed = rng.choice(members, size=args.rows)

    ts = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        idx = BloomIndex.build(hashed)
        ts.append(time.perf_counter() - t0)
    build_rps = args.rows / min(ts)
    log(f"build: {build_rps:,.0f} rows/s "
        f"({idx.words.shape[0]} granules x {BLOOM_WORDS} words)")

    # probe throughput: half present keys, half absent
    present = rng.choice(members, size=args.probes // 2)
    absent = np.asarray(
        [hash_bytes64(f"miss{i}".encode()) for i in range(args.probes // 2)],
        dtype=np.uint64,
    )
    probes = np.concatenate([present, absent])
    ts = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        hits = sum(
            bool(idx.granules_maybe_contain(int(h)).any()) for h in probes
        )
        ts.append(time.perf_counter() - t0)
    probe_qps = len(probes) / min(ts)
    log(f"probe: {probe_qps:,.0f} probes/s ({hits} maybe-hits)")

    # false-positive rate: absent keys that any granule claims
    fp = sum(
        bool(idx.granules_maybe_contain(int(h)).any()) for h in absent
    )
    fpr = fp / len(absent)
    log(f"fpr: {fpr:.4f} ({fp}/{len(absent)} absent keys claimed)")

    print(json.dumps({
        "metric": "bloom_filter",
        "rows": args.rows,
        "build_rows_per_s": round(build_rps),
        "probe_per_s": round(probe_qps),
        "false_positive_rate": round(fpr, 5),
        "unit": "rows/s",
        "value": round(build_rps),
    }))


if __name__ == "__main__":
    main()
