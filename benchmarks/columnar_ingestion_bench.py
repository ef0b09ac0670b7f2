#!/usr/bin/env python
"""Columnar ingestion benchmark: row-oriented vs columnar-with-codec.

Mirrors the reference's ColumnarIngestionBenchmark.cpp (MergeTree-style
ingestion: BM_Ingestion_RowOriented vs BM_Ingestion_Columnar_{LZ4,ZSTD}
across granule sizes): synthesize a hits-like event stream, ingest it

- row-oriented: one packed binary record per row (the reference's
  RowOrientedWriter role — here the zlib row store used by stored
  fields), and
- columnar: ColumnarTable -> write_table with per-column codec chains
  (none / lz4 / zstd / the numeric delta+t64 default),

and report rows/s, output MB, and compression ratio for each. One JSON
line on stdout; details to stderr.

Run: python benchmarks/columnar_ingestion_bench.py [--rows 500000]
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth(rows: int, seed: int = 7):
    rng = np.random.Generator(np.random.PCG64(seed))
    return {
        "event_ts": np.sort(rng.integers(0, 1 << 22, rows)),
        "user_id": rng.integers(0, 100000, rows),
        "region": rng.integers(0, 4096, rows),
        "duration": rng.gamma(2.0, 150.0, rows),
    }


def row_oriented(cols, rows: int) -> tuple:
    """Packed per-row records + zlib (the row store's framing)."""
    t0 = time.time()
    ts, uid, reg, dur = (
        cols["event_ts"], cols["user_id"], cols["region"], cols["duration"],
    )
    # vectorized pack: a [rows, 28] byte view of the four fields
    rec = np.zeros(
        rows,
        dtype=[("ts", "<i8"), ("uid", "<i8"), ("reg", "<i4"),
               ("dur", "<f8")],
    )
    rec["ts"], rec["uid"], rec["reg"], rec["dur"] = ts, uid, reg, dur
    raw = rec.tobytes()
    blob = zlib.compress(raw, 1)
    dt = time.time() - t0
    return dt, len(blob), len(raw)


def columnar(cols, rows: int, chain, granule_rows: int) -> tuple:
    from diagon_tpu.columnar import (
        ColumnarTable,
        Float64Column,
        Int64Column,
        write_table,
    )
    from diagon_tpu.store import RAMDirectory

    t0 = time.time()
    t = ColumnarTable(granule_rows=granule_rows)
    t.add_column("event_ts", Int64Column(cols["event_ts"]))
    t.add_column("user_id", Int64Column(cols["user_id"]))
    t.add_column("region", Int64Column(cols["region"]))
    t.add_column("duration", Float64Column(cols["duration"]))
    d = RAMDirectory()
    chains = {name: chain for name in t.columns} if chain else None
    write_table(d, "hits", t, chains=chains)
    dt = time.time() - t0
    raw = sum(c.values.nbytes for c in t.columns.values())
    return dt, d.file_length("hits.col"), raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--granule-rows", type=int, default=8192)
    args = ap.parse_args()

    from diagon_tpu.columnar.compression import CODECS

    cols = synth(args.rows)
    results = {}

    dt, out_bytes, raw = row_oriented(cols, args.rows)
    results["row_oriented_zlib"] = {
        "rows_per_s": round(args.rows / dt),
        "mb": round(out_bytes / 1e6, 2),
        "ratio": round(raw / out_bytes, 2),
    }
    log(f"row-oriented+zlib: {args.rows / dt:,.0f} rows/s "
        f"{out_bytes/1e6:.1f}MB ratio={raw/out_bytes:.2f}x")

    variants = [("columnar_none", ["none"]), ("columnar_lz4", ["lz4"])]
    if "zstd" in CODECS:
        variants.append(("columnar_zstd", ["zstd"]))
    variants.append(("columnar_default", None))  # per-type default chains
    for name, chain in variants:
        dt, out_bytes, raw = columnar(
            cols, args.rows, chain, args.granule_rows
        )
        results[name] = {
            "rows_per_s": round(args.rows / dt),
            "mb": round(out_bytes / 1e6, 2),
            "ratio": round(raw / out_bytes, 2),
        }
        log(f"{name}: {args.rows / dt:,.0f} rows/s "
            f"{out_bytes/1e6:.1f}MB ratio={raw/out_bytes:.2f}x")

    best = max(
        (v["rows_per_s"] for k, v in results.items()
         if k.startswith("columnar")),
    )
    print(json.dumps({
        "metric": "columnar_ingest_rows_per_s",
        "value": best,
        "unit": "rows/s",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
