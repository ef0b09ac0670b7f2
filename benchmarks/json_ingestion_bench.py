"""JSON ingestion benchmark (reference ``benchmarks/JsonIngestionBenchmark.cpp``).

Mirrors the reference's stages: parse-only (BM_JsonParse), manual field
construction (BM_ManualConstruct), and parse+index end-to-end
(BM_JsonParseAndIndex) — docs/s each, best of N trials (one-core host:
noise only subtracts). Prints ONE JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_json_docs(n: int) -> list:
    """Reuters-shaped JSON rows (the reference generates title/body/date
    rows inline, JsonIngestionBenchmark.cpp:40-70)."""
    from diagon_tpu.bench.synthetic import corpus_documents

    rows = []
    for doc in corpus_documents(num_docs=n):
        row = {}
        for f in doc.fields:
            row[f.name] = f.value
        rows.append(json.dumps(row))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=19043)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from diagon_tpu.document.document import Document, StringField, TextField
    from diagon_tpu.document.json_parser import JsonDocumentParser
    from diagon_tpu.document.mapping import IndexMapping
    from diagon_tpu.index.memory_index import MemoryIndex

    rows = make_json_docs(args.docs)
    log(f"{len(rows)} JSON rows materialized")
    # Reuters mapping: title/body text, date keyword (the untyped default
    # would misread date strings as text)
    mapping = IndexMapping().text("title").text("body").keyword("date")
    parser = JsonDocumentParser(mapping)

    def best(fn, unit_n):
        ts = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return unit_n / min(ts)

    # parse only (BM_JsonParse)
    parse_dps = best(lambda: [parser.parse(r) for r in rows], len(rows))
    log(f"parse only: {parse_dps:,.0f} docs/s")

    # manual construct (BM_ManualConstruct) — the no-JSON control
    objs = [json.loads(r) for r in rows]

    def construct():
        for o in objs:
            d = Document()
            d.add(TextField("title", o["title"]))
            d.add(TextField("body", o["body"]))
            d.add(StringField("date", o["date"]))

    construct_dps = best(construct, len(objs))
    log(f"manual construct: {construct_dps:,.0f} docs/s")

    # parse + index end-to-end (BM_JsonParseAndIndex)
    def parse_and_index():
        mem = MemoryIndex()
        mem.add_documents(parser.parse(r) for r in rows)
        return mem

    e2e_dps = best(parse_and_index, len(rows))
    log(f"parse+index: {e2e_dps:,.0f} docs/s")

    print(json.dumps({
        "metric": "json_ingestion",
        "docs": args.docs,
        "parse_docs_per_s": round(parse_dps),
        "construct_docs_per_s": round(construct_dps),
        "parse_index_docs_per_s": round(e2e_dps),
        "unit": "docs/s",
    }))


if __name__ == "__main__":
    main()
