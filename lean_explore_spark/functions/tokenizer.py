"""Tokenization exactly matching the reference's query/doc analyzer.

Reference semantics (src/lean_explore/local/search.py:630-638):

    tokens = re.findall(r"\\w+", text.lower())
    return [stemmer.stem(token) for token in tokens]

``\\w`` here is *Python* ``re`` — Unicode-aware, including digits and
underscore.  To stay byte-identical we tokenize only in Python (pandas
UDFs / driver), never with Spark SQL / Java regex (SURVEY.md §7 risk
register: JVM ``\\w`` differs on non-ASCII word characters).

Also carries ``spacify_text`` (reference
src/lean_explore/local/search.py:247-281, duplicated at
scripts/prepare_embedding_input.py:77-118) for full parity with the
reference's doc-text assembly, byte-for-byte.
"""

from __future__ import annotations

import re
from typing import List

from lean_explore_spark.functions.porter import porter_stem

_WORD_RE = re.compile(r"\w+")


def tokenize(text: str) -> List[str]:
    """Lowercase + Unicode ``\\w+`` tokens, no stemming."""
    if not text:
        return []
    return _WORD_RE.findall(text.lower())


def tokenize_stem(text: str) -> List[str]:
    """The reference analyzer: tokenize then Porter-stem each token."""
    if not text:
        return []
    return [porter_stem(t) for t in _WORD_RE.findall(text.lower())]


_CAMEL1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL2 = re.compile(r"([A-Z])([A-Z][a-z])")
_WS = re.compile(r"\s+")


def spacify_text(text: str) -> str:
    """Reference ``spacify_text`` (local/search.py:247-281), exact.

    Drops everything through the first '/', maps '-'/'_' to spaces,
    removes every '.lean' occurrence (str.replace, not suffix-only),
    splits camelCase twice, maps '/' and '.' to spaces, collapses
    whitespace, strips, lowercases.
    """
    processed_text = str(text)
    first_slash = processed_text.find("/")
    if first_slash != -1:
        processed_text = processed_text[first_slash + 1 :]
    processed_text = (
        processed_text.replace("-", " ").replace("_", " ").replace(".lean", "")
    )
    processed_text = _CAMEL1.sub(r"\1 \2", processed_text)
    processed_text = _CAMEL2.sub(r"\1 \2", processed_text)
    processed_text = processed_text.replace("/", " ").replace(".", " ")
    processed_text = _WS.sub(" ", processed_text).strip()
    return processed_text.lower()
