#!/usr/bin/env python
"""Human-readable index dump (the reference SimpleText codec's debugging
role, SURVEY.md §2.3: a codec you can read with your eyes; here a tool
that renders the packed binary format as text instead of a parallel
write path).

Usage:
  python tools/dump_index.py <index_dir>                    # overview
  python tools/dump_index.py <index_dir> --field body       # field stats
  python tools/dump_index.py <index_dir> --term body:oil    # postings
  python tools/dump_index.py <index_dir> --doc 7            # stored doc
  python tools/dump_index.py <index_dir> --top 20           # df-top terms
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--field", help="dump one field's stats")
    ap.add_argument("--term", help="FIELD:TEXT — dump a term's postings")
    ap.add_argument("--doc", type=int, help="dump one stored document")
    ap.add_argument("--top", type=int, default=0,
                    help="print the N highest-df terms per field")
    ap.add_argument("--max-postings", type=int, default=64)
    args = ap.parse_args()

    from diagon_tpu.codecs.postings import decode_block_numpy
    from diagon_tpu.index.reader import DirectoryReader
    from diagon_tpu.store import FSDirectory

    r = DirectoryReader.open(FSDirectory.open(args.index_dir))
    print(f"index: {args.index_dir}")
    print(f"segments: {len(r.leaves())}  maxDoc: {r.max_doc()}  "
          f"numDocs: {r.num_docs()}")

    for ctx in r.leaves():
        seg = ctx.reader.data
        print(f"\nsegment {seg.name}: docs {seg.num_docs} "
              f"(live {seg.num_live_docs}), docBase {ctx.doc_base}")
        for fname, fd in seg.fields.items():
            pp = fd.postings
            line = (f"  field {fname!r}: terms {pp.num_terms} "
                    f"blocks {pp.num_blocks} postings {pp.sum_doc_freq} "
                    f"positions "
                    f"{len(pp.positions) if pp.positions is not None else 0}")
            print(line)
            if args.field == fname or args.top:
                n = args.top or 10
                order = np.argsort(-pp.doc_freq)[:n]
                for tid in order:
                    print(f"    df {int(pp.doc_freq[tid]):>8} "
                          f"tf {int(pp.total_tf[tid]):>9}  "
                          f"{pp.terms[int(tid)]}")
        for dv, d in seg.doc_values.items():
            print(f"  docvalues {dv!r}: {type(d).__name__}")
        for pt in seg.points:
            print(f"  points {pt!r}")

        if args.term:
            fname, _, text = args.term.partition(":")
            fd = seg.fields.get(fname)
            if fd is None:
                print(f"  no field {fname!r}")
                continue
            pp = fd.postings
            tid = pp.term_id(text)
            if tid < 0:
                print(f"  term {args.term!r}: ABSENT")
                continue
            print(f"  term {args.term!r}: tid {tid} "
                  f"df {int(pp.doc_freq[tid])} tf {int(pp.total_tf[tid])}")
            shown = 0
            for b in range(int(pp.block_start[tid]),
                           int(pp.block_start[tid + 1])):
                docs, freqs = decode_block_numpy(pp, b)
                print(f"    block {b}: count {int(pp.block_count[b])} "
                      f"maxFreq {int(pp.block_max_freq[b])} "
                      f"maxNorm {int(pp.block_max_norm[b])}")
                for d, f in zip(docs, freqs):
                    if shown >= args.max_postings:
                        print("    ...")
                        break
                    print(f"      doc {int(d)} freq {int(f)}")
                    shown += 1
                if shown >= args.max_postings:
                    break

    if args.doc is not None:
        for ctx in r.leaves():
            base = ctx.doc_base
            seg = ctx.reader.data
            if base <= args.doc < base + seg.num_docs:
                print(f"\nstored doc {args.doc} (segment {seg.name}):")
                print(json.dumps(ctx.reader.document(args.doc - base),
                                 indent=2, default=str))
                break


if __name__ == "__main__":
    main()
