"""Bulk (vectorized C++) synthetic segment builder parity.

The scale benches build their corpora through ``bench/bulk_build.py``
(sample -> counting-sort invert -> native block packer) instead of the
per-document ingest loop. These tests pin the two invariants that make
that substitution safe: the inverted CSR matches a per-document oracle
inversion exactly, and the resulting segment is searched bit-exactly by
both engines (oracle vs device plans) and round-trips the .bnd format.
"""

import numpy as np
import pytest

from diagon_tpu.bench.bulk_build import build_synthetic_segment
from diagon_tpu.bench.queries import REUTERS_QUERIES

nat = pytest.importorskip("diagon_tpu.native._native")


@pytest.fixture(scope="module")
def seg():
    return build_synthetic_segment(num_docs=3000, vocab_size=4000)


def test_invert_tokens_matches_python_inversion():
    rng = np.random.Generator(np.random.PCG64(7))
    V = 50
    doc_len = rng.integers(0, 40, size=200).astype(np.int32)
    toks = rng.integers(0, V, size=int(doc_len.sum())).astype(np.int32)
    es_b, d_b, f_b, p_b = nat.invert_tokens(
        doc_len.tobytes(), toks.tobytes(), V, True
    )
    es = np.frombuffer(es_b, np.int64)
    docs = np.frombuffer(d_b, np.int32)
    freqs = np.frombuffer(f_b, np.int32)
    pos = np.frombuffer(p_b, np.int32)

    # python oracle: per-doc Counter walk
    exp = {v: [] for v in range(V)}
    exp_pos = {v: [] for v in range(V)}
    i = 0
    for d, L in enumerate(doc_len.tolist()):
        seen = {}
        for p in range(L):
            t = int(toks[i + p])
            seen.setdefault(t, []).append(p)
        i += L
        for t in sorted(seen):
            exp[t].append((d, len(seen[t])))
            exp_pos[t].extend(seen[t])
    ps = np.zeros(len(freqs) + 1, np.int64)
    np.cumsum(freqs, out=ps[1:])
    for v in range(V):
        got = list(
            zip(docs[es[v]:es[v + 1]].tolist(),
                freqs[es[v]:es[v + 1]].tolist())
        )
        assert got == exp[v], f"term {v} postings"
        got_pos = pos[ps[es[v]]:ps[es[v + 1]]].tolist()
        assert got_pos == exp_pos[v], f"term {v} positions"


def test_bulk_segment_shape(seg):
    assert seg.num_docs == 3000
    assert set(seg.fields) == {"body", "title", "date"}
    body = seg.fields["body"]
    assert body.with_positions
    assert body.postings.doc_count_with_field == 3000
    # dict must be sorted (front-coded term dict contract)
    assert body.postings.terms == sorted(body.postings.terms)
    assert int(body.postings.doc_freq.min()) >= 1
    # dates: <=420 uniques, every doc exactly once
    date = seg.fields["date"]
    assert int(date.postings.doc_freq.sum()) == 3000
    assert len(date.postings.terms) <= 420


def test_bulk_segment_oracle_vs_engine_bit_exact(seg):
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.search.searcher import IndexSearcher

    s = IndexSearcher([seg])
    oracle = OracleSearcher([seg])
    for name in ("term:dollar", "or20", "and2:oil+price",
                 "phrase:oil price", "phrase:federal reserve bank"):
        q = REUTERS_QUERIES[name]
        want = oracle.search(q, 10)
        got = s.search(q, 10)
        assert got.doc_ids() == want.doc_ids(), name
        assert got.total_hits == want.total_hits, name
        for o, g in zip(want.score_docs, got.score_docs):
            assert o.score == g.score, name
        assert want.total_hits > 0, f"{name}: planted term has no hits"


def test_bulk_segment_bnd_roundtrip(seg, tmp_path):
    from diagon_tpu.search.oracle import OracleSearcher
    from diagon_tpu.store import FSDirectory
    from diagon_tpu.store.format import read_segment, write_segment

    d = FSDirectory(str(tmp_path))
    write_segment(d, seg)
    seg2 = read_segment(d, "_bench")
    assert seg2.num_docs == seg.num_docs
    o1 = OracleSearcher([seg])
    o2 = OracleSearcher([seg2])
    for name in ("or20", "phrase:oil price"):
        q = REUTERS_QUERIES[name]
        r1, r2 = o1.search(q, 10), o2.search(q, 10)
        assert r1.doc_ids() == r2.doc_ids()
        assert [s.score for s in r1.score_docs] == [
            s.score for s in r2.score_docs
        ]
