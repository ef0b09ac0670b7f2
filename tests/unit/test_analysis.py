"""Tokenizer/analyzer tests.

Golden cases mirror the reference's ASCII StandardTokenizer semantics
(util/StandardTokenizer.h:113-152).
"""

from diagon_tpu.analysis import (
    ENGLISH_STOP_WORDS,
    StopFilter,
    SynonymFilter,
    ASCIIFoldingFilter,
    analyzer_for_name,
    keyword_tokenize,
    standard_tokenize,
    whitespace_tokenize,
)


def test_standard_tokenize_basic():
    assert standard_tokenize("Hello, World!") == ["hello", "world"]


def test_standard_tokenize_alnum_and_apostrophe():
    # Apostrophe continues a token but cannot start one.
    assert standard_tokenize("don't stop") == ["don't", "stop"]
    assert standard_tokenize("'quoted'") == ["quoted'"]


def test_standard_tokenize_numbers():
    assert standard_tokenize("Q3 earnings rose 12.5 pct") == [
        "q3", "earnings", "rose", "12", "5", "pct",
    ]


def test_standard_tokenize_punct_runs():
    assert standard_tokenize("a--b__c") == ["a", "b", "c"]
    assert standard_tokenize("...") == []
    assert standard_tokenize("") == []


def test_standard_tokenize_unicode_fallback():
    assert standard_tokenize("café prices") == ["café", "prices"]


def test_whitespace_and_keyword():
    assert whitespace_tokenize("Foo  Bar\tbaz") == ["Foo", "Bar", "baz"]
    assert keyword_tokenize("New York") == ["New York"]
    assert keyword_tokenize("") == []


def test_stop_filter():
    f = StopFilter(ENGLISH_STOP_WORDS)
    assert f.filter(["the", "oil", "price", "of", "it"]) == ["oil", "price"]


def test_synonym_filter():
    f = SynonymFilter({"usa": ["usa", "america"]})
    assert f.filter(["the", "usa"]) == ["the", "usa", "america"]


def test_ascii_folding():
    f = ASCIIFoldingFilter()
    assert f.filter(["café"]) == ["cafe"]


def test_analyzer_factory():
    a = analyzer_for_name("standard")
    assert a.analyze("Oil Prices!") == ["oil", "prices"]
    e = analyzer_for_name("english")
    assert e.analyze("The oil price") == ["oil", "price"]
    try:
        analyzer_for_name("nope")
        assert False
    except ValueError:
        pass


def test_cjk_bigram_tokenize():
    from diagon_tpu.analysis import cjk_bigram_tokenize

    # CJK runs -> overlapping bigrams; a lone ideograph stays a unigram.
    assert cjk_bigram_tokenize("北京大学") == ["北京", "京大", "大学"]
    assert cjk_bigram_tokenize("茶") == ["茶"]
    # Mixed script: latin words follow standard rules, runs split bigrams.
    assert cjk_bigram_tokenize("IBM 在北京") == ["ibm", "在北", "北京"]
    # Punctuation breaks a CJK run (no bigram across the comma).
    assert cjk_bigram_tokenize("北京，大学") == ["北京", "大学"]
    assert cjk_bigram_tokenize("") == []


def test_chinese_analyzer_stops():
    a = analyzer_for_name("chinese")
    # "的" alone is a stopword unigram; inside a run it still bigrams.
    assert a.analyze("我 的 书") == ["书"]  # 我/的 stopped, 书 kept
    toks = a.analyze("中国的发展")
    assert "中国" in toks and "发展" in toks


def test_multilingual_analyzer():
    a = analyzer_for_name("multilingual")
    # folding + lowercase, no English stops, Han one-per-token (UAX#29).
    assert a.analyze("The Café") == ["the", "cafe"]
    assert a.analyze("東京 Tokyo") == ["東", "京", "tokyo"]


def test_english_analyzer_folds_and_stops():
    e = analyzer_for_name("english")
    assert e.analyze("The résumé") == ["resume"]


def test_chinese_field_end_to_end():
    from diagon_tpu.document import Document, TextField
    from diagon_tpu.index.memory_index import MemoryIndex
    from diagon_tpu.index.segment import flush_memory_index
    from diagon_tpu.search import IndexSearcher, PhraseQuery, TermQuery

    mem = MemoryIndex()
    texts = ["北京大学的学生", "上海交通大学", "天气很好"]
    for t in texts:
        mem.add_document(
            Document().add(TextField("body", t, analyzer="chinese"))
        )
    seg = flush_memory_index(mem, "_zh")
    s = IndexSearcher([seg])
    td = s.search(TermQuery("body", "大学"), k=10)
    assert sorted(td.doc_ids()) == [0, 1]
    # phrase over bigram tokens: "北京" followed by "京大" = 北京大...
    td = s.search(PhraseQuery("body", ["北京", "京大"]), k=10)
    assert td.doc_ids() == [0]
    assert s.search(TermQuery("body", "天气"), k=10).doc_ids() == [2]
