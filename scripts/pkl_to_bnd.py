"""Convert a pickled scale-segment cache to a .bnd bundle directory.

The .bnd bundle (the engine's own on-disk format) mmap-loads in seconds;
unpickling the 10M-doc host object costs minutes of one-core CPU —
bench.py prefers segment_<N>.bnd.d/ when present.

Usage: python scripts/pkl_to_bnd.py --docs 10000000
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diagon_tpu.bench.cache import bench_cache_dir

CACHE_DIR = bench_cache_dir()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    args = ap.parse_args()
    pkl = os.path.join(CACHE_DIR, f"segment_{args.docs}.pkl")
    out = os.path.join(CACHE_DIR, f"segment_{args.docs}.bnd.d")
    from diagon_tpu.store import FSDirectory
    from diagon_tpu.store.format import read_segment, write_segment

    t0 = time.time()
    with open(pkl, "rb") as f:
        seg, stats = pickle.load(f)
    print(f"unpickle: {time.time() - t0:.1f}s", flush=True)
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    write_segment(FSDirectory(out), seg)
    with open(os.path.join(out, "stats.json"), "w") as f:
        json.dump(stats, f)
    print(f"write .bnd: {time.time() - t0:.1f}s -> {out}", flush=True)
    t0 = time.time()
    seg2 = read_segment(FSDirectory(out), "_bench")
    assert seg2.num_docs == seg.num_docs
    print(f"read-back check: {time.time() - t0:.1f}s ok", flush=True)


if __name__ == "__main__":
    main()
