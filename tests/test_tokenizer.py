"""Tokenizer / spacify parity tests (reference local/search.py:247-281, :630-638)."""

from lean_explore_spark.functions.tokenizer import spacify_text, tokenize, tokenize_stem


def test_tokenize_basic():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_tokenize_unicode_word_chars():
    # Python re \w is Unicode-aware: digits, underscore, non-ASCII letters
    assert tokenize("naïve café_table 42x") == ["naïve", "café_table", "42x"]
    assert tokenize("Gruppenhomomorphismus über") == [
        "gruppenhomomorphismus",
        "über",
    ]


def test_tokenize_stem_applies_porter():
    assert tokenize_stem("Continuous functions theorems") == [
        "continu",
        "function",
        "theorem",
    ]
    # repeated tokens preserved (query-term multiplicity, SURVEY.md §2.9)
    assert tokenize_stem("ring ring") == ["ring", "ring"]


def test_spacify_text():
    # examples mirroring reference doc-text assembly on source_file paths
    assert spacify_text("Mathlib/Data/Nat/Basic.lean") == "data nat basic"
    assert spacify_text("Mathlib/CategoryTheory/Limits.lean") == (
        "category theory limits"
    )
    assert spacify_text("no-slash_here.lean") == "no slash here"
    assert spacify_text("") == ""
