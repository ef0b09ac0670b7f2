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
