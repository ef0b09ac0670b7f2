"""Build and cache a large synthetic-Reuters segment for scale benches.

Streams documents through MemoryIndex (no materialized doc list — a 10M
corpus would hold tens of GB of Document objects), flushes one segment,
and pickles it to the bench cache so bench.py / scripts/scale10m.py can
load it without re-ingesting.

Usage: python scripts/build_scale.py --docs 10000000
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.path.expanduser("~/.cache/diagon_tpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"segment_{args.docs}.pkl")
    if os.path.exists(cache) and not args.force:
        print(f"already cached: {cache}")
        return

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
            print(f"ingested {n:,} docs ({rate:,.0f} docs/s)", flush=True)
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
    t0 = time.time()
    with open(cache + ".tmp", "wb") as f:
        pickle.dump((seg, stats), f, protocol=4)
    os.replace(cache + ".tmp", cache)
    print(f"cached {cache} ({os.path.getsize(cache)/1e9:.1f} GB, "
          f"dump {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
