#!/usr/bin/env python
"""Directory I/O micro-benchmark: stream read vs mmap zero-copy.

Mirrors the reference's MMapDirectoryBenchmark.cpp
(BM_{FS,MMap}Directory_SequentialRead_{Small,Large} + random reads):
write small (64 KB) and large (64 MB) files through FSDirectory, then
measure

- read_bytes: the buffered whole-file read (the reference's
  IndexInput::readBytes loop role),
- open_mmap: the zero-copy mmap view (MMapDirectory role) — first-touch
  sequential sum forces the pages in,
- mmap random access: 4 KB strided gathers from the mapped view, and
- bundle_load: an ArrayBundle segment-style section read via mmap
  (the path device uploads take: .bnd -> aligned views -> device_put).

One JSON line on stdout; details to stderr.

Run: python benchmarks/directory_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from diagon_tpu.store import FSDirectory
    from diagon_tpu.store.format import ArrayBundleReader, ArrayBundleWriter

    results = {}
    rng = np.random.Generator(np.random.PCG64(13))
    with tempfile.TemporaryDirectory() as tmp:
        d = FSDirectory(tmp)
        small = rng.integers(0, 256, 64 << 10, dtype=np.uint8).tobytes()
        large = rng.integers(0, 256, 64 << 20, dtype=np.uint8).tobytes()
        d.write_bytes("small.bin", small)
        d.write_bytes("large.bin", large)

        for name, blob, iters in (("small", small, 200), ("large", large, 5)):
            nbytes = len(blob)
            t = timeit(lambda: d.read_bytes(f"{name}.bin"), iters)
            results[f"fs_read_{name}_mb_s"] = round(nbytes / t / 1e6)
            log(f"read_bytes {name}: {nbytes / t / 1e6:,.0f} MB/s")

            def mmap_seq():
                v = d.open_mmap(f"{name}.bin")
                return int(v[:: 4096].sum())  # touch every page

            t = timeit(mmap_seq, iters)
            results[f"mmap_seq_{name}_mb_s"] = round(nbytes / t / 1e6)
            log(f"open_mmap+touch {name}: {nbytes / t / 1e6:,.0f} MB/s")

        # random 4 KB reads from the mapped large file
        v = d.open_mmap("large.bin")
        offs = rng.integers(0, len(large) - 4096, 4096)

        def mmap_random():
            s = 0
            for o in offs[:1024]:
                s += int(v[o])
            return s

        t = timeit(mmap_random, 5)
        results["mmap_random_4k_us"] = round(t / 1024 * 1e6, 3)
        log(f"mmap random touch: {t / 1024 * 1e6:.3f} us/read")

        # bundle section read (the .bnd load path device uploads ride)
        w = ArrayBundleWriter({"bench": 1})
        arrs = {
            f"a{i}": rng.integers(0, 1 << 30, 1 << 20, dtype=np.int64)
            for i in range(8)
        }
        for k, a in arrs.items():
            w.add(k, a)
        d.write_bytes("seg.bnd", w.tobytes())
        nbytes = d.file_length("seg.bnd")

        def bundle_load():
            r = ArrayBundleReader(d.open_mmap("seg.bnd"))
            tot = 0
            for k in arrs:
                tot += int(r.array(k)[0])
            return tot

        t = timeit(bundle_load, 10)
        results["bundle_load_mb_s"] = round(nbytes / t / 1e6)
        log(f"bundle mmap load ({nbytes/1e6:.0f}MB): "
            f"{nbytes / t / 1e6:,.0f} MB/s")

    print(json.dumps({
        "metric": "mmap_seq_large_mb_s",
        "value": results["mmap_seq_large_mb_s"],
        "unit": "MB/s",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
