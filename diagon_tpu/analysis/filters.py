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
