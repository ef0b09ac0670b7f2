"""Vectorized CSR packer vs reference dict packer equivalence."""

import numpy as np
import pytest

from diagon_tpu.codecs.postings import (
    build_packed_postings,
    build_packed_postings_csr,
    decode_block_numpy,
)


def _make_csr(rng, num_terms, num_docs, max_df, with_pos=True):
    terms = sorted(f"t{i:04d}" for i in range(num_terms))
    entry_start = [0]
    docs_l, freqs_l, pos_start_l, pos_l = [], [], [0], []
    for t in terms:
        df = int(rng.integers(1, max_df + 1))
        docs = np.sort(rng.choice(num_docs, size=min(df, num_docs), replace=False))
        freqs = rng.integers(1, 40, size=len(docs))
        docs_l.append(docs)
        freqs_l.append(freqs)
        entry_start.append(entry_start[-1] + len(docs))
        if with_pos:
            for f in freqs:
                p = np.sort(rng.choice(5000, size=int(f), replace=False))
                pos_l.append(p)
                pos_start_l.append(pos_start_l[-1] + int(f))
    docs = np.concatenate(docs_l)
    freqs = np.concatenate(freqs_l)
    out = dict(
        terms=terms,
        entry_start=np.asarray(entry_start, np.int64),
        docs=docs.astype(np.int32),
        freqs=freqs.astype(np.int32),
    )
    if with_pos:
        out["pos_start"] = np.asarray(pos_start_l, np.int64)
        out["positions"] = (
            np.concatenate(pos_l).astype(np.int32) if pos_l else np.zeros(0, np.int32)
        )
    return out


@pytest.mark.parametrize("seed,num_terms,max_df", [(1, 40, 700), (2, 5, 3), (3, 100, 140)])
def test_csr_equals_dict_packer(seed, num_terms, max_df):
    rng = np.random.Generator(np.random.PCG64(seed))
    num_docs = 4000
    csr = _make_csr(rng, num_terms, num_docs, max_df)
    norms = rng.integers(1, 127, size=num_docs).astype(np.uint8)

    # dict form of the same postings
    d = {}
    dpos = {}
    for tid, t in enumerate(csr["terms"]):
        s, e = csr["entry_start"][tid], csr["entry_start"][tid + 1]
        d[t] = (
            csr["docs"][s:e].astype(np.int64),
            csr["freqs"][s:e].astype(np.int64),
        )
        dpos[t] = [
            csr["positions"][csr["pos_start"][j] : csr["pos_start"][j + 1]]
            for j in range(s, e)
        ]

    ref = build_packed_postings(d, dpos, norms)
    got = build_packed_postings_csr(
        csr["terms"], csr["entry_start"], csr["docs"], csr["freqs"],
        csr["pos_start"], csr["positions"], norms,
    )

    assert got.terms == ref.terms
    np.testing.assert_array_equal(got.block_start, ref.block_start)
    np.testing.assert_array_equal(got.doc_freq, ref.doc_freq)
    np.testing.assert_array_equal(got.total_tf, ref.total_tf)
    np.testing.assert_array_equal(got.block_term, ref.block_term)
    np.testing.assert_array_equal(got.block_base, ref.block_base)
    np.testing.assert_array_equal(got.block_count, ref.block_count)
    np.testing.assert_array_equal(got.block_max_freq, ref.block_max_freq)
    np.testing.assert_array_equal(got.block_max_norm, ref.block_max_norm)
    np.testing.assert_array_equal(got.block_entry_start, ref.block_entry_start)
    assert got.sum_total_tf == ref.sum_total_tf
    assert got.sum_doc_freq == ref.sum_doc_freq

    # bit widths may differ only upward (log2 rounding); decode must agree
    assert (got.block_doc_bits >= ref.block_doc_bits - 0).all()
    for b in range(ref.num_blocks):
        rd, rf = decode_block_numpy(ref, b)
        gd, gf = decode_block_numpy(got, b)
        np.testing.assert_array_equal(rd, gd)
        np.testing.assert_array_equal(rf, gf)

    np.testing.assert_array_equal(got.positions, ref.positions)
    np.testing.assert_array_equal(got.pos_start, ref.pos_start)


def test_csr_empty():
    pp = build_packed_postings_csr([], np.zeros(1, np.int64),
                                   np.zeros(0, np.int32), np.zeros(0, np.int32))
    assert pp.num_terms == 0 and pp.num_blocks == 0
