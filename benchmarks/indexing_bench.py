#!/usr/bin/env python
"""Indexing throughput benchmark (reference: IndexingBenchmark.cpp /
reuters_benchmark.cpp phase 1: 43k docs/s raw, 5.2k incl. forceMerge).

Measures docs/s for ingest (tokenize+accumulate), flush (pack), commit,
and forceMerge(1) on the synthetic Reuters corpus through IndexWriter.
Run: python benchmarks/indexing_bench.py [--docs 19043]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=19043)
    args = ap.parse_args()

    from diagon_tpu.bench.synthetic import corpus_documents
    from diagon_tpu.index.writer import IndexWriter, IndexWriterConfig
    from diagon_tpu.store import FSDirectory
    from diagon_tpu.native import available

    log(f"native tier: {available()}")
    docs = list(corpus_documents(num_docs=args.docs))
    path = tempfile.mkdtemp(prefix="diagon_idx_bench_")
    try:
        d = FSDirectory(path)
        w = IndexWriter(
            d, IndexWriterConfig(ram_buffer_mb=512, merge_scheduler="serial")
        )
        t0 = time.time()
        for doc in docs:
            w.add_document(doc)
        t_ingest = time.time() - t0
        t0 = time.time()
        w.flush()
        t_flush = time.time() - t0
        t0 = time.time()
        w.commit()
        t_commit = time.time() - t0
        t0 = time.time()
        w.force_merge(1)
        w.commit_merge_results()
        t_merge = time.time() - t0
        w.close()

        total_bytes = sum(d.file_length(f) for f in d.list_files())
        n = args.docs
        raw_dps = n / (t_ingest + t_flush)
        full_dps = n / (t_ingest + t_flush + t_commit + t_merge)
        log(f"ingest {t_ingest:.1f}s flush {t_flush:.1f}s commit "
            f"{t_commit:.1f}s merge {t_merge:.1f}s")
        log(f"raw (excl merge): {raw_dps:.0f} docs/s | incl merge: "
            f"{full_dps:.0f} docs/s | {total_bytes / n:.0f} bytes/doc")
        print(json.dumps({
            "metric": "indexing_docs_per_s",
            "value": round(raw_dps, 1),
            "unit": "docs/s",
            "vs_baseline": round(raw_dps / 43000.0, 3),
        }))
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
