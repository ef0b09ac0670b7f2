"""Build and cache a large synthetic-Reuters segment for scale benches.

Default path: the vectorized bulk builder (bench/bulk_build.py — C++
token sampling + counting-sort inversion + native block packer), ~10 min
for 10M docs on this one-core host. ``--slow`` keeps the original
per-document MemoryIndex ingest (the honest ingest-API path, ~4.5 h at
10M) for cross-validation.

Usage: python scripts/build_scale.py --docs 10000000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diagon_tpu.bench.cache import bench_cache_dir

CACHE_DIR = bench_cache_dir()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--slow", action="store_true",
                    help="per-document MemoryIndex ingest (cross-check)")
    args = ap.parse_args()

    os.makedirs(CACHE_DIR, exist_ok=True)
    bnd_dir = os.path.join(CACHE_DIR, f"segment_{args.docs}.bnd.d")
    if os.path.isdir(bnd_dir) and not args.force:
        print(f"already cached: {bnd_dir}")
        return

    if not args.slow:
        from diagon_tpu.bench.bulk_build import build_synthetic_segment

        t0 = time.time()
        seg = build_synthetic_segment(
            num_docs=args.docs,
            log=lambda *a: print(*a, flush=True),
        )
        t_build = time.time() - t0
        stats = {
            "build_s": round(t_build, 2),
            "docs_per_s": round(args.docs / t_build),
            "builder": "bulk",
        }
        print(f"bulk build {t_build:.1f}s = "
              f"{stats['docs_per_s']:,} docs/s e2e", flush=True)
    else:
        from diagon_tpu.bench.synthetic import corpus_documents
        from diagon_tpu.index.memory_index import MemoryIndex
        from diagon_tpu.index.segment import flush_memory_index

        mem = MemoryIndex()
        t0 = time.time()
        n = 0
        for doc in corpus_documents(num_docs=args.docs):
            mem.add_document(doc)
            n += 1
            if n % 1_000_000 == 0:
                rate = n / (time.time() - t0)
                print(f"ingested {n:,} docs ({rate:,.0f} docs/s)",
                      flush=True)
        t_ingest = time.time() - t0
        t0 = time.time()
        seg = flush_memory_index(mem, "_bench")
        t_flush = time.time() - t0
        stats = {
            "ingest_s": round(t_ingest, 2),
            "flush_s": round(t_flush, 2),
            "docs_per_s": round(args.docs / (t_ingest + t_flush)),
        }
        print(f"ingest {t_ingest:.1f}s flush {t_flush:.1f}s "
              f"= {stats['docs_per_s']:,} docs/s e2e", flush=True)
    # write the .bnd bundle directly (the engine's own mmap-loadable
    # on-disk format) — a 10M-doc pickle is ~19 GB and costs minutes of
    # one-core dump/load; the bundle loads in seconds
    import json

    from diagon_tpu.store import FSDirectory
    from diagon_tpu.store.format import write_segment

    t0 = time.time()
    tmp = bnd_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    write_segment(FSDirectory(tmp), seg)
    with open(os.path.join(tmp, "stats.json"), "w") as f:
        json.dump(stats, f)
    if os.path.isdir(bnd_dir):
        import shutil

        shutil.rmtree(bnd_dir)
    os.replace(tmp, bnd_dir)
    size = sum(
        os.path.getsize(os.path.join(bnd_dir, f))
        for f in os.listdir(bnd_dir)
    )
    print(f"cached {bnd_dir} ({size/1e9:.1f} GB, "
          f"write {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
