"""Sparse-vector index tests: quantization, device-vs-oracle parity."""

import numpy as np
import pytest

from diagon_tpu.sparse import SparseIndex, SparseSearcher, SparseVector


def _random_vectors(rng, n_docs, vocab=500, nnz=30):
    out = []
    for _ in range(n_docs):
        k = int(rng.integers(5, nnz))
        ids = np.sort(rng.choice(vocab, size=k, replace=False))
        vals = rng.random(k).astype(np.float32) * 3 + 0.01
        out.append(SparseVector(ids, vals))
    return out


def test_sparse_vector_dot():
    a = SparseVector([1, 5, 9], [1.0, 2.0, 3.0])
    b = SparseVector([5, 9, 11], [10.0, 1.0, 7.0])
    assert a.dot(b) == 23.0
    assert len(a) == 3


def test_sparse_vector_sorts():
    v = SparseVector([9, 1], [2.0, 1.0])
    np.testing.assert_array_equal(v.ids, [1, 9])
    np.testing.assert_array_equal(v.values, [1.0, 2.0])


def test_quantization_error_bounded():
    rng = np.random.Generator(np.random.PCG64(3))
    vecs = _random_vectors(rng, 200)
    idx = SparseIndex.build(vecs)
    # reconstruct each stored weight; error <= scale (ceil/round to >=1 bin)
    from diagon_tpu.codecs.postings import decode_block_numpy

    pp = idx.segment.fields["_sparse"].postings
    for tid, term in enumerate(pp.terms[:50]):
        scale = idx.scales[term]
        for b in range(int(pp.block_start[tid]), int(pp.block_start[tid + 1])):
            docs, bins = decode_block_numpy(pp, b)
            for d, bn in zip(docs, bins):
                orig = dict(zip(vecs[d].ids, vecs[d].values))[int(term)]
                assert abs(bn * scale - orig) <= scale * 0.5 + 1e-6


def test_device_matches_quantized_oracle():
    rng = np.random.Generator(np.random.PCG64(4))
    vecs = _random_vectors(rng, 600)
    idx = SparseIndex.build(vecs)
    searcher = SparseSearcher(idx)

    for qseed in range(3):
        qrng = np.random.Generator(np.random.PCG64(100 + qseed))
        q = _random_vectors(qrng, 1, nnz=12)[0]
        ds, dd, dh = searcher.search(q, 10)
        os_, od, oh = searcher.search_oracle(q, 10)
        assert dh == oh
        np.testing.assert_array_equal(dd, od)
        np.testing.assert_array_equal(ds, os_)


def test_quantized_topk_close_to_exact():
    """Quantized top-10 should track exact dot-product top-10 closely."""
    rng = np.random.Generator(np.random.PCG64(9))
    vecs = _random_vectors(rng, 400)
    idx = SparseIndex.build(vecs)
    searcher = SparseSearcher(idx)
    q = _random_vectors(np.random.Generator(np.random.PCG64(77)), 1)[0]

    exact = np.asarray([q.dot(v) for v in vecs])
    exact_top = set(np.argsort(-exact)[:10].tolist())
    _, dd, _ = searcher.search(q, 10)
    overlap = len(exact_top & set(int(d) for d in dd))
    assert overlap >= 8  # 255-bin quantization barely perturbs ranking


def test_missing_terms_query():
    vecs = _random_vectors(np.random.Generator(np.random.PCG64(5)), 50)
    idx = SparseIndex.build(vecs)
    searcher = SparseSearcher(idx)
    q = SparseVector([99999], [1.0])
    scores, docs, hits = searcher.search(q, 10)
    assert hits == 0 and len(scores) == 0


def test_search_batch_matches_single():
    rng = np.random.Generator(np.random.PCG64(11))
    vecs = _random_vectors(rng, 300)
    idx = SparseIndex.build(vecs)
    searcher = SparseSearcher(idx)
    qs = _random_vectors(np.random.Generator(np.random.PCG64(12)), 5, nnz=15)
    qs.append(SparseVector([999999], [1.0]))  # no matches
    batch = searcher.search_batch(qs, 10)
    for q, (bs, bd, bh) in zip(qs, batch):
        ss, sd, sh = searcher.search(q, 10)
        assert bh == sh
        np.testing.assert_array_equal(bd, sd)
        np.testing.assert_array_equal(bs, ss)


def test_alpha_clause_pruning():
    """alpha<1 prunes low-gain clauses; ranking stays close to exact."""
    rng = np.random.Generator(np.random.PCG64(21))
    vecs = _random_vectors(rng, 400)
    idx = SparseIndex.build(vecs)
    searcher = SparseSearcher(idx)
    q = _random_vectors(np.random.Generator(np.random.PCG64(22)), 1, nnz=25)[0]

    full_s, full_d, _ = searcher.search(q, 10, alpha=1.0)
    part_s, part_d, _ = searcher.search(q, 10, alpha=0.8)
    # pruned plan drops clauses -> scores can only stay equal or drop
    assert len(part_d) == len(full_d)
    overlap = len(set(int(d) for d in full_d) & set(int(d) for d in part_d))
    assert overlap >= 7
    # alpha=1.0 path unchanged vs oracle
    os_, od, _ = searcher.search_oracle(q, 10)
    np.testing.assert_array_equal(full_d, od)


def test_rerank_exact_parity_fuzz():
    """search_rerank must equal brute-force exact search bit-for-bit
    (docids, f32 scores, hit counts) on fuzzed corpora — the reference's
    SindiIndex is exact and BlockMaxQuantizedIndex reranks; round 1 had
    only the quantized path (recall 0.975)."""
    from diagon_tpu.sparse.index import SparseIndex, SparseSearcher
    from diagon_tpu.sparse.vector import SparseVector

    rng = np.random.Generator(np.random.PCG64(77))
    for trial in range(4):
        n_docs = int(rng.integers(300, 900))
        vocab = int(rng.integers(50, 200))
        vecs = []
        for _ in range(n_docs):
            nnz = int(rng.integers(2, 12))
            ids = rng.choice(vocab, nnz, replace=False)
            vals = (rng.random(nnz) * 4 + 0.05).astype(np.float32)
            vecs.append(SparseVector(ids, vals))
        idx = SparseIndex.build(vecs)
        s = SparseSearcher(idx)
        for _ in range(6):
            nnz = int(rng.integers(1, 8))
            q = SparseVector(
                rng.choice(vocab, nnz, replace=False),
                (rng.random(nnz) * 2 + 0.1).astype(np.float32),
            )
            k = int(rng.integers(1, 20))
            # tiny R forces the certificate + escalation path
            gs, gd, gh = s.search_rerank(q, k=k, R=16)
            ws, wd, wh = s.search_exact(q, k=k)
            np.testing.assert_array_equal(gd, wd)
            np.testing.assert_array_equal(gs, ws)
            assert gh == wh


def test_rerank_improves_on_quantized():
    """There exist queries where quantized-only top-k differs from exact;
    rerank must fix them (this is the recall gap rerank exists for)."""
    from diagon_tpu.sparse.index import SparseIndex, SparseSearcher
    from diagon_tpu.sparse.vector import SparseVector

    rng = np.random.Generator(np.random.PCG64(5))
    vecs = []
    for _ in range(600):
        nnz = int(rng.integers(3, 10))
        ids = rng.choice(80, nnz, replace=False)
        vals = (rng.random(nnz) * 6 + 0.01).astype(np.float32)
        vecs.append(SparseVector(ids, vals))
    idx = SparseIndex.build(vecs)
    s = SparseSearcher(idx)
    diffs = 0
    for _ in range(20):
        nnz = int(rng.integers(2, 6))
        q = SparseVector(
            rng.choice(80, nnz, replace=False),
            (rng.random(nnz) + 0.1).astype(np.float32),
        )
        qs, qd, _ = s.search(q, k=10)
        ws, wd, _ = s.search_exact(q, k=10)
        gs, gd, _ = s.search_rerank(q, k=10)
        np.testing.assert_array_equal(gd, wd)
        np.testing.assert_array_equal(gs, ws)
        if list(qd) != list(wd):
            diffs += 1
    assert diffs >= 1, "fuzz never exercised the quantized/exact gap"


def test_batch_pruned_parity_vs_oracle():
    """The serving path: a batch large enough to engage the PRUNED compact
    kernel (thresholds forced down) must stay bit-exact vs the quantized
    numpy oracle — certificate escalation included."""
    rng = np.random.Generator(np.random.PCG64(21))
    vecs = _random_vectors(rng, 1500, vocab=300, nnz=25)
    idx = SparseIndex.build(vecs)
    searcher = SparseSearcher(idx)
    ex = searcher.executor
    ex.prune_min_docs = 1024
    ex.prune_solo_min_docs = 1024
    ex.approx_min_q = 4
    ex.prune_B0 = 2  # tiny tile budget -> exercises escalation too
    qs = _random_vectors(
        np.random.Generator(np.random.PCG64(22)), 12, vocab=300, nnz=12
    )
    before = ex.metrics["pruned"].value()
    batch = searcher.search_batch(qs, 10)
    assert ex.metrics["pruned"].value() > before, "pruned path not engaged"
    for q, (bs, bd, bh) in zip(qs, batch):
        os_, od, oh = searcher.search_oracle(q, 10)
        assert bh == oh
        np.testing.assert_array_equal(bd, od)
        np.testing.assert_array_equal(bs, os_)


def test_rerank_batch_matches_exact():
    """search_rerank_batch (one batched quantized dispatch + host exact
    rescore + certificate, escalating per query) must equal brute-force
    exact search bit-for-bit, like search_rerank does."""
    from diagon_tpu.sparse.index import SparseIndex, SparseSearcher
    from diagon_tpu.sparse.vector import SparseVector

    rng = np.random.Generator(np.random.PCG64(123))
    vecs = []
    for _ in range(700):
        nnz = int(rng.integers(2, 12))
        ids = rng.choice(150, nnz, replace=False)
        vals = (rng.random(nnz) * 4 + 0.05).astype(np.float32)
        vecs.append(SparseVector(ids, vals))
    idx = SparseIndex.build(vecs)
    s = SparseSearcher(idx)
    qs = []
    for _ in range(12):
        nnz = int(rng.integers(1, 8))
        qs.append(SparseVector(
            rng.choice(150, nnz, replace=False),
            (rng.random(nnz) * 2 + 0.1).astype(np.float32),
        ))
    # tiny R forces the certificate + per-query escalation path
    got = s.search_rerank_batch(qs, k=10, R=16)
    for q, (gs, gd, gh) in zip(qs, got):
        ws, wd, wh = s.search_exact(q, k=10)
        np.testing.assert_array_equal(gd, wd)
        np.testing.assert_array_equal(gs, ws)
        assert gh == wh
