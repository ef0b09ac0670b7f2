"""Postings codec benchmark (reference ``benchmarks/PostingsFormatBenchmark.cpp``).

Mirrors its encode/decode measurements: BM_PostingsDecode_StreamVByte /
BM_PostingsEncode over generated postings. Here the format is the packed
128-doc fixed-width delta block codec (``codecs/postings.py``), encoded
with the vectorized CSR packer and decoded with the vectorized full
decoder — entries/s each, plus bytes/entry. Prints ONE JSON line.
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


def synth_postings(num_terms: int, avg_df: int, num_docs: int, seed=23):
    """Zipf-ish doc frequencies, ascending docids, tf ~ geometric —
    the reference generates uniform docid gaps (PostingsFormatBenchmark
    .cpp:40-66); this adds the realistic skew the fixed-width blocks
    actually see."""
    rng = np.random.Generator(np.random.PCG64(seed))
    dfs = np.minimum(
        (rng.pareto(1.2, num_terms) * avg_df).astype(np.int64) + 1,
        num_docs // 2,
    )
    entry_start = np.zeros(num_terms + 1, dtype=np.int64)
    np.cumsum(dfs, out=entry_start[1:])
    NE = int(entry_start[-1])
    docs = np.empty(NE, dtype=np.int64)
    for t in range(num_terms):
        s, e = entry_start[t], entry_start[t + 1]
        docs[s:e] = np.sort(rng.choice(num_docs, size=e - s, replace=False))
    freqs = (rng.geometric(0.4, NE)).astype(np.int64)
    return entry_start, docs, freqs, NE


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--terms", type=int, default=2000)
    ap.add_argument("--avg-df", type=int, default=400)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from diagon_tpu.codecs.postings import (
        build_packed_postings_csr,
        decode_all_numpy,
    )

    entry_start, docs, freqs, NE = synth_postings(
        args.terms, args.avg_df, args.docs
    )
    terms = [f"t{i}" for i in range(args.terms)]
    log(f"{args.terms} terms, {NE} entries")

    def best(fn):
        out, ts = None, []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        return out, NE / min(ts)

    pp, enc_eps = best(
        lambda: build_packed_postings_csr(terms, entry_start, docs, freqs)
    )
    nbytes = pp.packed.nbytes
    log(f"encode: {enc_eps:,.0f} entries/s ({nbytes / NE:.2f} packed B/entry)")

    (d2, f2), dec_eps = best(lambda: decode_all_numpy(pp))
    log(f"decode: {dec_eps:,.0f} entries/s")
    assert np.array_equal(d2, docs.astype(np.int32))
    assert np.array_equal(f2, freqs.astype(np.int32))
    log("round-trip exact")

    print(json.dumps({
        "metric": "postings_codec",
        "entries": NE,
        "encode_entries_per_s": round(enc_eps),
        "decode_entries_per_s": round(dec_eps),
        "packed_bytes_per_entry": round(nbytes / NE, 2),
        "unit": "entries/s",
        "value": round(dec_eps),
    }))


if __name__ == "__main__":
    main()
