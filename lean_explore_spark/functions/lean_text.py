"""Lean-source text operators (reference parity F5-F13, SURVEY.md §2.7).

Fresh implementations of the reference's Lean text cleaning semantics
(cited per function); each is a pure function usable directly and via
``clean_udfs`` as Arrow pandas UDFs.  These are the stateful character
parsers that cannot be Spark SQL expressions (SURVEY.md §2.7 maps them
to pandas UDFs).
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Sequence

PROOF_BEARING_DECL_TYPES = frozenset({"theorem", "lemma", "example"})


def strip_attributes(text: str) -> str:
    """Remove ``@[...]`` attribute blocks (nested-bracket aware) plus
    any whitespace immediately following each block; an unclosed block
    leaves the ``@`` literal (reference phase3_tasks.py:30-78)."""
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        if text[i] != "@" or i + 1 >= n or text[i + 1] != "[":
            out.append(text[i])
            i += 1
            continue
        depth = 0
        j = i + 1
        closed = -1
        while j < n:
            if text[j] == "[":
                depth += 1
            elif text[j] == "]":
                depth -= 1
                if depth == 0:
                    closed = j
                    break
            j += 1
        if closed < 0:
            out.append("@")
            i += 1
        else:
            i = closed + 1
            while i < n and text[i].isspace():
                i += 1
    return "".join(out)


def strip_comments(text: str) -> str:
    """Remove nested ``/- -/`` block comments and ``--`` line comments,
    string-literal aware (escapes honored); drop now-blank lines and
    strip the result (reference phase3_tasks.py:81-157).

    The reference parser consumes a third char for ``/--`` openers
    (both at entry and when nesting) and keeps the newline that ends a
    line comment — reproduced exactly.
    """
    out: List[str] = []
    i, n = 0, len(text)
    in_str = False
    escaped = False
    depth = 0
    while i < n:
        c = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if in_str:
            out.append(c)
            if escaped:
                escaped = False
            elif c == "\\":
                escaped = True
            elif c == '"':
                in_str = False
            i += 1
        elif depth > 0:
            if c == "-" and nxt == "/":
                depth -= 1
                i += 2
            elif c == "/" and nxt == "-":
                depth += 1
                i += 2
                if i < n and text[i] == "-":
                    i += 1
            else:
                i += 1
        elif c == '"':
            in_str = True
            escaped = False
            out.append(c)
            i += 1
        elif c == "/" and nxt == "-":
            depth = 1
            i += 2
            if i < n and text[i] == "-":
                i += 1
        elif c == "-" and nxt == "-":
            i += 2
            while i < n and text[i] != "\n":
                i += 1
            if i < n:
                out.append("\n")
                i += 1
        else:
            out.append(c)
            i += 1
    kept = [ln for ln in "".join(out).splitlines() if ln.strip()]
    return "\n".join(kept).strip()


def strip_leading_docstring(text: str) -> str:
    """Remove one leading ``/-- ... -/`` docstring if the block is
    comment-free inside; prefer an ``-/\\n`` end marker over a bare
    ``-/`` (reference phase2_tasks.py:194-212)."""
    if not text.lstrip().startswith("/--"):
        return text
    start = text.find("/--")
    end_nl = text.find("-/\n", start + 3)
    end_any = text.find("-/", start + 3)
    if end_nl != -1 and (end_any == -1 or end_nl < end_any):
        end, skip = end_nl, 3
    elif end_any != -1:
        end, skip = end_any, 2
    else:
        return text
    if "/-" in text[start + 3 : end]:
        return text
    return text[end + skip :]


def top_level_assign_index(text: str) -> Optional[int]:
    """Index of the first ``:=`` outside any paren/bracket/brace
    nesting (reference phase2_tasks.py:157-185); levels clamp at 0."""
    paren = bracket = brace = 0
    for i in range(len(text) - 1):
        c = text[i]
        if c == "(":
            paren += 1
        elif c == ")":
            paren = max(0, paren - 1)
        elif c == "[":
            bracket += 1
        elif c == "]":
            bracket = max(0, bracket - 1)
        elif c == "{":
            brace += 1
        elif c == "}":
            brace = max(0, brace - 1)
        elif c == ":" and text[i + 1] == "=" and not (paren or bracket or brace):
            return i
    return None


def extract_signature(text: str, decl_type: str) -> str:
    """For proof-bearing decls (theorem/lemma/example) return the text
    before the top-level ``:=`` (rstripped); otherwise, or without a
    delimiter, the text unchanged (reference phase2_tasks.py:703-722)."""
    if decl_type not in PROOF_BEARING_DECL_TYPES:
        return text
    idx = top_level_assign_index(text)
    if idx is None:
        return text
    return text[:idx].rstrip()


def text_hash(text: str) -> str:
    """LF-normalized SHA-256 hex (reference phase3_tasks.py:160-173)."""
    return hashlib.sha256(text.replace("\r\n", "\n").encode("utf-8")).hexdigest()


def module_name_to_rel_path(module_name: str) -> Optional[str]:
    """'Mathlib.Data.Nat.Basic' → 'Mathlib/Data/Nat/Basic.lean'
    (reference phase1_tasks.py:33-60, incl. the «.lake». rewrite)."""
    if not module_name:
        return None
    if module_name.startswith("«.lake».") and not module_name.startswith(
        "«.lake».packages."
    ):
        module_name = module_name.replace("«.lake».", ".lake/", 1)
    parts = module_name.split(".")
    if not parts:
        return None
    return "/".join(parts) + ".lean"


def is_word_in_text(word: str, text: str) -> bool:
    """Whole-word regex containment (reference phase3_tasks.py:176-190)."""
    if not word or not text:
        return False
    return re.search(r"\b" + re.escape(word) + r"\b", text) is not None


def hierarchical_name_matches(
    names: Sequence[str], statement_text: str
) -> List[str]:
    """Try FQN suffixes from longest to shortest; return the names that
    match at the FIRST level with any hit (phase3_tasks.py:193-243)."""
    if not names or not statement_text:
        return []
    max_levels = max(len(n.split(".")) for n in names if n)
    for level in range(max_levels):
        hits = []
        for name in names:
            if not name:
                continue
            parts = name.split(".")
            if level >= len(parts):
                continue
            suffix = ".".join(parts[level:])
            if is_word_in_text(suffix, statement_text):
                hits.append(name)
        if hits:
            return hits
    return []


def clean_display_text(text: str) -> str:
    """The reference's display-text pipeline: strip attributes then all
    comments (phase3_tasks.py:553-611 order)."""
    return strip_comments(strip_attributes(text))


def clean_udfs():
    """Arrow pandas UDF wrappers for the pure functions above."""
    import pandas as pd  # noqa: F401 (annotation resolution)
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType

    globals()["pd"] = pd  # make 'pd.Series' hints resolvable

    @F.pandas_udf(StringType())
    def strip_attributes_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: strip_attributes(t) if t is not None else None)

    @F.pandas_udf(StringType())
    def clean_display_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: clean_display_text(t) if t is not None else None)

    @F.pandas_udf(StringType())
    def strip_docstring_udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: strip_leading_docstring(t) if t is not None else None
        )

    return {
        "strip_attributes": strip_attributes_udf,
        "clean_display": clean_display_udf,
        "strip_docstring": strip_docstring_udf,
    }
