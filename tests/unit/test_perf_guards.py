"""Performance-guard tests (reference BM25PerformanceGuard.cpp /
FSTPerformanceGuard.cpp pattern: regression thresholds compiled into the
suite). Thresholds are ~5x looser than measured so only order-of-magnitude
regressions (an accidental per-posting Python loop, a quadratic merge)
trip them.

Timing uses process CPU time, and the whole module skips when the host is
already loaded: this box has ONE core, and a concurrent CPU-bound job
(e.g. a corpus build) degrades even CPU-time IPC ~4x via cache pollution —
a guard failure then says nothing about the code.
"""

import os
import time

import numpy as np
import pytest

if os.getloadavg()[0] > 1.5:
    pytest.skip(
        "host contended (1m loadavg > 1.5); perf guards would measure "
        "scheduler cache pollution, not regressions",
        allow_module_level=True,
    )

from diagon_tpu.bench.synthetic import corpus_documents
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index


def test_ingest_throughput_guard():
    docs = list(corpus_documents(num_docs=2000))
    mem = MemoryIndex()
    t0 = time.process_time()
    for d in docs:
        mem.add_document(d)
    rate = 2000 / (time.process_time() - t0)
    # measured ~20k docs/s on one core (native tokenizer+accumulator);
    # guard at ~4x below so CI contention doesn't flake but a fallback to
    # the Python tokenize loop (~2k docs/s) trips
    assert rate > 5000, f"ingest regressed: {rate:.0f} docs/s"


def test_flush_throughput_guard():
    docs = list(corpus_documents(num_docs=2000))
    mem = MemoryIndex()
    for d in docs:
        mem.add_document(d)
    t0 = time.process_time()
    seg = flush_memory_index(mem, "_g")
    dt = time.process_time() - t0
    # measured ~0.03s at 2k docs with the native pack_blocks packer;
    # guard at ~10x so losing the native path (numpy: ~0.5s) trips
    assert dt < 0.4, f"flush regressed: {dt:.2f}s for 2k docs"
    assert seg.num_docs == 2000


def test_vectorized_packer_guard():
    """The CSR packer must stay vectorized (no per-posting Python loop)."""
    from diagon_tpu.codecs.postings import build_packed_postings_csr

    rng = np.random.Generator(np.random.PCG64(1))
    T, NE = 2000, 400_000
    df = np.full(T, NE // T)
    entry_start = np.zeros(T + 1, np.int64)
    np.cumsum(df, out=entry_start[1:])
    docs = np.concatenate(
        [np.sort(rng.choice(100_000, NE // T, replace=False)) for _ in range(T)]
    )
    freqs = rng.integers(1, 30, NE)
    terms = [f"t{i:05d}" for i in range(T)]
    t0 = time.process_time()
    pp = build_packed_postings_csr(terms, entry_start, docs, freqs)
    dt = time.process_time() - t0
    assert pp.sum_doc_freq == NE
    # measured ~0.02s native / ~0.9s numpy; guard between (0.4M postings)
    assert dt < 0.5, f"CSR packer regressed: {dt:.2f}s for {NE} postings"


def test_decode_all_guard():
    from diagon_tpu.codecs.postings import (
        build_packed_postings_csr,
        decode_all_numpy,
    )

    rng = np.random.Generator(np.random.PCG64(2))
    NE = 500_000
    docs = np.sort(rng.choice(2_000_000, NE, replace=False))
    freqs = rng.integers(1, 20, NE)
    pp = build_packed_postings_csr(
        ["one"], np.asarray([0, NE], np.int64), docs, freqs
    )
    t0 = time.process_time()
    d, f = decode_all_numpy(pp)
    dt = time.process_time() - t0
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(f, freqs)
    assert dt < 5.0, f"decode_all regressed: {dt:.2f}s for {NE} postings"
