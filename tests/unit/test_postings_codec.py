"""Round-trip tests for the packed posting-block format."""

import numpy as np

from diagon_tpu.codecs.postings import (
    BLOCK_SIZE,
    build_packed_postings,
    decode_block_numpy,
)


def _random_postings(rng, num_terms, num_docs, max_df):
    out = {}
    for t in range(num_terms):
        df = int(rng.integers(1, max_df + 1))
        docs = np.sort(rng.choice(num_docs, size=min(df, num_docs), replace=False))
        freqs = rng.integers(1, 50, size=len(docs))
        out[f"term{t:04d}"] = (docs.astype(np.int64), freqs.astype(np.int64))
    return out


def test_roundtrip_all_blocks():
    rng = np.random.Generator(np.random.PCG64(7))
    tp = _random_postings(rng, num_terms=50, num_docs=5000, max_df=900)
    pp = build_packed_postings(tp)

    assert pp.num_terms == 50
    assert pp.terms == sorted(tp.keys())

    for tid, term in enumerate(pp.terms):
        docs, freqs = tp[term]
        got_docs, got_freqs = [], []
        for b in range(int(pp.block_start[tid]), int(pp.block_start[tid + 1])):
            assert pp.block_term[b] == tid
            d, f = decode_block_numpy(pp, b)
            got_docs.append(d)
            got_freqs.append(f)
        np.testing.assert_array_equal(np.concatenate(got_docs), docs)
        np.testing.assert_array_equal(np.concatenate(got_freqs), freqs)
        assert pp.doc_freq[tid] == len(docs)
        assert pp.total_tf[tid] == freqs.sum()


def test_block_structure():
    docs = np.arange(0, 300, dtype=np.int64)  # df=300 -> 3 blocks
    freqs = np.ones(300, dtype=np.int64)
    pp = build_packed_postings({"a": (docs, freqs)})
    assert pp.num_blocks == 3
    np.testing.assert_array_equal(pp.block_count, [128, 128, 44])
    np.testing.assert_array_equal(pp.block_base, [0, 128, 256])
    # delta=1 everywhere -> 1-bit packing
    np.testing.assert_array_equal(pp.block_doc_bits, [1, 1, 1])
    # all-freq-1 blocks omit the freq section entirely (fbits == 0)
    np.testing.assert_array_equal(pp.block_freq_bits, [0, 0, 0])
    assert pp.block_max_freq.max() == 1


def test_block_max_stats():
    docs = np.array([5, 9, 100], dtype=np.int64)
    freqs = np.array([2, 9, 4], dtype=np.int64)
    norms = np.zeros(200, dtype=np.uint8)
    norms[5], norms[9], norms[100] = 10, 40, 20
    pp = build_packed_postings({"x": (docs, freqs)}, norms=norms)
    assert pp.block_max_freq[0] == 9
    assert pp.block_max_norm[0] == 40


def test_positions_roundtrip():
    docs = np.array([1, 3, 200], dtype=np.int64)
    freqs = np.array([2, 1, 3], dtype=np.int64)
    poslists = [np.array([0, 7]), np.array([4]), np.array([1, 2, 9])]
    pp = build_packed_postings(
        {"x": (docs, freqs)}, term_positions={"x": poslists}
    )
    assert pp.pos_start is not None
    np.testing.assert_array_equal(pp.pos_start, [0, 2, 3, 6])
    np.testing.assert_array_equal(pp.positions, [0, 7, 4, 1, 2, 9])
