"""BM25 correctness against hand-computed values (reference
search/BM25CorrectnessTest.cpp analogue)."""

import math

import numpy as np

from diagon_tpu.document import Document, TextField
from diagon_tpu.index.memory_index import MemoryIndex
from diagon_tpu.index.segment import flush_memory_index
from diagon_tpu.search.bm25 import BM25Similarity
from diagon_tpu.search.query import TermQuery
from diagon_tpu.search.searcher import IndexSearcher


def test_idf_formula():
    sim = BM25Similarity()
    # ln(1 + (N - df + 0.5)/(df + 0.5))
    assert np.isclose(sim.idf(1, 1), math.log(1 + 0.5 / 1.5), rtol=1e-6)
    assert np.isclose(
        sim.idf(10, 1000), math.log(1 + 990.5 / 10.5), rtol=1e-6
    )
    # idf is monotonically decreasing in df
    vals = [sim.idf(df, 1000) for df in [1, 5, 50, 500, 1000]]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_norm_decode_reference_cases():
    # BM25Similarity.h:216-224: norm 0 and 127 decode to length 1.0
    assert BM25Similarity.decode_norm_length(0) == 1.0
    assert BM25Similarity.decode_norm_length(127) == 1.0
    # norm 89 (length 2): (127/89)^2
    got = float(BM25Similarity.decode_norm_length(89))
    assert np.isclose(got, (127.0 / 89.0) ** 2, rtol=1e-6)


def test_end_to_end_score_hand_computed():
    """Index 2 docs; verify the device score equals the formula computed
    by hand in float32."""
    mem = MemoryIndex()
    mem.add_document(Document().add(TextField("body", "cat dog")))          # len 2
    mem.add_document(Document().add(TextField("body", "cat cat cat mouse")))  # len 4
    seg = flush_memory_index(mem, "_0")
    s = IndexSearcher([seg])
    td = s.search(TermQuery("body", "cat"), 10)

    N = 2
    df = 2
    idf = np.float32(np.log(np.float32(1.0) + (np.float32(N - df) + np.float32(0.5)) / (np.float32(df) + np.float32(0.5))))
    avgdl = np.float32(6.0) / np.float32(2.0)  # sumTotalTermFreq=6, maxDoc=2

    def score(freq, length):
        norm = int(127.0 / np.sqrt(length))
        if norm in (0, 127):
            fl = np.float32(1.0)
        else:
            inv = np.float32(127.0) / np.float32(norm)
            fl = inv * inv
        k = np.float32(1.2) * (
            np.float32(1.0)
            - np.float32(0.75)
            + np.float32(0.75) * fl * (np.float32(1.0) / avgdl)
        )
        return np.float32(idf * (np.float32(freq) / (np.float32(freq) + k)))

    by_doc = {sd.doc: sd.score for sd in td.score_docs}
    assert by_doc[0] == float(score(1, 2))
    assert by_doc[1] == float(score(3, 4))
    # tf saturation: doc1 (tf 3, longer) still outranks doc0 (tf 1)
    assert td.score_docs[0].doc == 1


def test_score_monotonic_in_tf_and_length():
    mem = MemoryIndex()
    texts = [
        "term " + "pad " * 8,            # tf 1, len 9
        "term term " + "pad " * 7,       # tf 2, len 9
        "term " + "pad " * 30,           # tf 1, len 31 (longer -> lower)
    ]
    for t in texts:
        mem.add_document(Document().add(TextField("body", t.strip())))
    seg = flush_memory_index(mem, "_0")
    s = IndexSearcher([seg])
    td = s.search(TermQuery("body", "term"), 10)
    by_doc = {sd.doc: sd.score for sd in td.score_docs}
    assert by_doc[1] > by_doc[0] > by_doc[2]
