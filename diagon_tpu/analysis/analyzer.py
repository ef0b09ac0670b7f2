"""Analyzer = tokenizer + filter chain, plus the prebuilt factory.

Mirrors the reference's ``analysis/Analyzer.h`` ``CompositeAnalyzer`` and
``AnalyzerFactory.cpp:14-89`` (whitespace / keyword / simple / standard /
english / search prebuilt analyzers; the reference's chinese/multilingual
Jieba analyzers are out of scope per SURVEY.md section 7).
"""

from __future__ import annotations

from typing import List, Sequence

from diagon_tpu.analysis.filters import (
    ASCIIFoldingFilter,
    ENGLISH_STOP_WORDS,
    LowercaseFilter,
    StopFilter,
    TokenFilter,
)
from diagon_tpu.analysis.tokenizers import (
    KeywordTokenizer,
    StandardTokenizer,
    WhitespaceTokenizer,
)


class Analyzer:
    def analyze(self, text: str) -> List[str]:
        raise NotImplementedError


class CompositeAnalyzer(Analyzer):
    def __init__(self, tokenizer, filters: Sequence[TokenFilter] = ()):
        self.tokenizer = tokenizer
        self.filters = list(filters)

    def analyze(self, text: str) -> List[str]:
        tokens = self.tokenizer.tokenize(text)
        for f in self.filters:
            tokens = f.filter(tokens)
        return tokens


class StandardAnalyzer(CompositeAnalyzer):
    """StandardTokenizer (already lowercases). The index-time default."""

    def __init__(self):
        super().__init__(StandardTokenizer(), [])


class WhitespaceAnalyzer(CompositeAnalyzer):
    def __init__(self):
        super().__init__(WhitespaceTokenizer(), [])


class KeywordAnalyzer(CompositeAnalyzer):
    def __init__(self):
        super().__init__(KeywordTokenizer(), [])


class EnglishAnalyzer(CompositeAnalyzer):
    def __init__(self):
        super().__init__(StandardTokenizer(), [StopFilter(ENGLISH_STOP_WORDS)])


class SimpleAnalyzer(CompositeAnalyzer):
    def __init__(self):
        super().__init__(WhitespaceTokenizer(), [LowercaseFilter()])


class SearchAnalyzer(CompositeAnalyzer):
    def __init__(self):
        super().__init__(StandardTokenizer(), [ASCIIFoldingFilter()])


_FACTORY = {
    "standard": StandardAnalyzer,
    "whitespace": WhitespaceAnalyzer,
    "keyword": KeywordAnalyzer,
    "english": EnglishAnalyzer,
    "simple": SimpleAnalyzer,
    "search": SearchAnalyzer,
}


def analyzer_for_name(name: str) -> Analyzer:
    """Factory lookup (reference ``AnalyzerFactory::create``)."""
    try:
        return _FACTORY[name]()
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; available: {sorted(_FACTORY)}"
        ) from None
