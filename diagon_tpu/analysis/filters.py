"""Token filters: lowercase, stop words, synonyms, ASCII folding.

Equivalents of the reference's ``analysis/`` filter chain
(``LowercaseFilter``, ``StopFilter``, ``SynonymFilter``,
``ASCIIFoldingFilter`` — SURVEY.md section 2.5).
"""

from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List, Sequence

# Lucene's default English stop set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET).
ENGLISH_STOP_WORDS = frozenset(
    [
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with",
    ]
)


# Common Chinese function-word stop set (reference StopFilter.cpp
# StopWordSet::CHINESE plays the same role for its Jieba word stream).
# Under bigram tokenization single-character entries match length-1 CJK
# runs and two-character entries match their bigram token directly.
CHINESE_STOP_WORDS = frozenset(
    [
        "的", "了", "在", "是", "我", "有", "和", "就", "不", "人", "都",
        "一", "上", "也", "很", "到", "说", "要", "去", "你", "会", "着",
        "没", "看", "好", "这", "那", "与", "为", "对", "而", "且", "或",
        "一个", "我们", "你们", "他们", "什么", "这个", "那个", "因为",
        "所以", "但是", "如果", "虽然", "可以", "没有", "就是", "这样",
    ]
)


class TokenFilter:
    def filter(self, tokens: List[str]) -> List[str]:
        raise NotImplementedError


class LowercaseFilter(TokenFilter):
    def filter(self, tokens: List[str]) -> List[str]:
        return [t.lower() for t in tokens]


class StopFilter(TokenFilter):
    def __init__(self, stop_words: Iterable[str] = ENGLISH_STOP_WORDS):
        self.stop_words = frozenset(stop_words)

    def filter(self, tokens: List[str]) -> List[str]:
        return [t for t in tokens if t not in self.stop_words]


class SynonymFilter(TokenFilter):
    """Maps tokens through a synonym table (single-token expansion).

    ``synonyms`` maps a token to the list of tokens to emit in its place
    (including itself if it should be kept).
    """

    def __init__(self, synonyms: Dict[str, Sequence[str]]):
        self.synonyms = {k: list(v) for k, v in synonyms.items()}

    def filter(self, tokens: List[str]) -> List[str]:
        out: List[str] = []
        for t in tokens:
            out.extend(self.synonyms.get(t, [t]))
        return out


class ASCIIFoldingFilter(TokenFilter):
    """Fold accented characters to their ASCII base (NFKD strip)."""

    def filter(self, tokens: List[str]) -> List[str]:
        out = []
        for t in tokens:
            folded = unicodedata.normalize("NFKD", t)
            out.append(folded.encode("ascii", "ignore").decode("ascii") or t)
        return out
