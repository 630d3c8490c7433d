"""Behavioral vectors for the Lean text operators (SURVEY.md §2.7
F5-F13), checked against the reference implementations' documented
semantics — and, where the reference code is importable, directly
against it."""

from __future__ import annotations

import sys

import pytest

from lean_explore_spark.functions import lean_text as L

REF = "/root/reference/dev_tools"


def _ref_modules():
    """Import the reference's phase modules for differential testing
    (read-only; used purely as a runtime test oracle).  Their heavy
    dependencies (sqlalchemy ORM, tqdm, the lean_explore package) are
    absent here, so stub just enough module surface to import the pure
    text functions."""
    import types
    from unittest.mock import MagicMock

    stubs = {}
    for name in [
        "sqlalchemy",
        "sqlalchemy.orm",
        "sqlalchemy.exc",
        "sqlalchemy.dialects",
        "sqlalchemy.dialects.sqlite",
        "tqdm",
        "lean_explore",
        "lean_explore.shared",
        "lean_explore.shared.models",
        "lean_explore.shared.models.db",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda attr, _m=MagicMock(): _m  # type: ignore
            stubs[name] = mod
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    try:
        from population import phase2_tasks, phase3_tasks  # type: ignore

        return phase2_tasks, phase3_tasks
    except Exception:
        return None, None
    finally:
        sys.path.remove(REF)
        for name in stubs:
            sys.modules.pop(name, None)


P2, P3 = _ref_modules()

ATTR_CASES = [
    "@[simp] theorem foo : 1 = 1 := rfl",
    "@[simp, norm_cast [nested [deep]]] def bar := 2",
    "no attributes here",
    "@[unclosed attribute...",
    "@[a] @[b]\n  theorem t : True := trivial",
    "text @ [not an attribute]",
]

COMMENT_CASES = [
    "def x := 1 -- a line comment",
    "/- block -/ def y := 2",
    "/- nested /- inner -/ outer -/ def z := 3",
    'def s := "a string with -- no comment and /- none -/" -- real',
    "/-- docstring style -/\ntheorem t : True := trivial",
    "line1\n\n-- only a comment\nline2",
    'escaped "quote \\" inside" -- trailing',
]

DOCSTRING_CASES = [
    "/-- doc -/\ntheorem t : True := trivial",
    "/-- doc -/ theorem t : True := trivial",
    "/-- unterminated...",
    "theorem t : True := trivial",
    "/-- outer /- inner -/ -/\ndef x := 1",
    "  /-- leading ws -/\ndef y := 2",
]

SIG_CASES = [
    ("theorem foo : a = b := by simp", "theorem"),
    ("theorem tricky (h : x := y) : p := proof", "theorem"),
    ("def notproof : Nat := 5", "def"),
    ("theorem nodelim : True", "theorem"),
    ("lemma l [inst := d] : q := pf", "lemma"),
]


@pytest.mark.skipif(P3 is None, reason="reference not importable")
def test_strip_attributes_differential():
    for case in ATTR_CASES:
        assert L.strip_attributes(case) == P3._remove_attributes_from_text(
            case
        ), case


@pytest.mark.skipif(P3 is None, reason="reference not importable")
def test_strip_comments_differential():
    for case in COMMENT_CASES:
        assert L.strip_comments(case) == P3._remove_all_comments_from_text(
            case
        ), case


@pytest.mark.skipif(P2 is None, reason="reference not importable")
def test_strip_docstring_differential():
    for case in DOCSTRING_CASES:
        assert L.strip_leading_docstring(
            case
        ) == P2.remove_docstring_from_text(case), case


@pytest.mark.skipif(P2 is None, reason="reference not importable")
def test_top_level_delimiter_differential():
    for case, _ in SIG_CASES:
        assert L.top_level_assign_index(
            case
        ) == P2._find_top_level_delimiter_index(case), case


@pytest.mark.skipif(P3 is None, reason="reference not importable")
def test_text_hash_differential():
    for case in ["a\r\nb", "plain", "multi\nline\r\n"]:
        assert L.text_hash(case) == P3._calculate_text_hash(case)


def test_signature_extraction():
    assert (
        L.extract_signature("theorem foo : a = b := by simp", "theorem")
        == "theorem foo : a = b"
    )
    # ':=' inside parens is not top-level
    assert (
        L.extract_signature("theorem t (h : x := y) : p := proof", "theorem")
        == "theorem t (h : x := y) : p"
    )
    # non-proof-bearing types pass through
    assert L.extract_signature("def d : Nat := 5", "def") == "def d : Nat := 5"
    assert L.extract_signature("theorem nodelim : True", "theorem") == (
        "theorem nodelim : True"
    )


def test_module_path():
    assert (
        L.module_name_to_rel_path("Mathlib.Data.Nat.Basic")
        == "Mathlib/Data/Nat/Basic.lean"
    )
    assert L.module_name_to_rel_path("") is None
    assert L.module_name_to_rel_path("Single") == "Single.lean"


def test_hierarchical_match():
    names = ["Nat.add_comm", "Nat.mul_comm", "List.map"]
    # full FQN present → only that one, no deeper levels tried
    assert L.hierarchical_name_matches(names, "uses Nat.add_comm here") == [
        "Nat.add_comm"
    ]
    # nothing at level 0; level-1 suffixes match two
    got = L.hierarchical_name_matches(names, "add_comm and mul_comm appear")
    assert got == ["Nat.add_comm", "Nat.mul_comm"]
    assert L.hierarchical_name_matches(names, "no names") == []


def test_clean_udfs_on_spark(spark):
    udfs = L.clean_udfs()
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(ATTR_CASES)], "id long, text string"
    )
    rows = df.select(
        "id", udfs["strip_attributes"]("text").alias("clean")
    ).collect()
    for r in rows:
        assert r["clean"] == L.strip_attributes(ATTR_CASES[r["id"]])
