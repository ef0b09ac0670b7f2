"""Tokenizers.

``standard_tokenize`` reproduces the reference's indexing-time tokenizer
exactly (``util/StandardTokenizer.h:113-152`` ASCII fast path, reached from
``document/Field.h:110`` -> ``FreqProxTermsWriter.cpp:75``): a token starts at
an ASCII alphanumeric character, continues over alphanumerics and apostrophes,
and is lowercased. Non-ASCII input falls back to a Unicode word-ish splitter
(the reference uses ICU UAX#29; we approximate with Python ``str.isalnum``
runs, which matches for the benchmark corpora which are pure ASCII).

When the native C++ extension is built (``diagon_tpu/native``), the ASCII path
dispatches to it; behavior is identical and covered by the same tests.
"""

from __future__ import annotations

from typing import List

_ASCII_ALNUM = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)
_ASCII_ALNUM_APOS = _ASCII_ALNUM | {"'"}

# Optional native fast path (C++; see diagon_tpu/native/tokenizer.cpp).
try:  # pragma: no cover - exercised when the extension is built
    from diagon_tpu.native import _native

    _native_tokenize = _native.standard_tokenize_ascii
except Exception:  # pragma: no cover
    _native_tokenize = None


def _is_ascii(text: str) -> bool:
    try:
        text.encode("ascii")
        return True
    except UnicodeEncodeError:
        return False


def _standard_tokenize_ascii_py(text: str) -> List[str]:
    tokens: List[str] = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c not in _ASCII_ALNUM:
            i += 1
            continue
        start = i
        i += 1
        while i < n and text[i] in _ASCII_ALNUM_APOS:
            i += 1
        tokens.append(text[start:i].lower())
    return tokens


def _standard_tokenize_unicode(text: str) -> List[str]:
    # Approximation of the reference's ICU BreakIterator path
    # (StandardTokenizer.h:68 tokenizeICU): split on runs of alphanumeric
    # code points, keep tokens containing a letter or digit, lowercase.
    tokens: List[str] = []
    cur: List[str] = []
    for ch in text:
        if ch.isalnum() or (ch == "'" and cur):
            cur.append(ch)
        else:
            if cur:
                tokens.append("".join(cur).lower())
                cur = []
    if cur:
        tokens.append("".join(cur).lower())
    return tokens


def standard_tokenize(text: str) -> List[str]:
    """Lucene-StandardTokenizer-compatible tokenization (lowercased)."""
    if not text:
        return []
    if _is_ascii(text):
        if _native_tokenize is not None:
            return _native_tokenize(text)
        return _standard_tokenize_ascii_py(text)
    return _standard_tokenize_unicode(text)


def whitespace_tokenize(text: str) -> List[str]:
    """Split on whitespace only; no case folding.

    Mirrors the reference's ``util/FastTokenizer.h`` / WhitespaceTokenizer.
    """
    return text.split()


def keyword_tokenize(text: str) -> List[str]:
    """Whole input as a single token (reference KeywordTokenizer)."""
    return [text] if text else []


class StandardTokenizer:
    def tokenize(self, text: str) -> List[str]:
        return standard_tokenize(text)


class WhitespaceTokenizer:
    def tokenize(self, text: str) -> List[str]:
        return whitespace_tokenize(text)


class KeywordTokenizer:
    def tokenize(self, text: str) -> List[str]:
        return keyword_tokenize(text)
