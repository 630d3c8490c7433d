"""Primary-declaration selection (F12) + internal-name classifier (P6).

Fresh implementations of the reference's representative-declaration
heuristics:

* ``is_internal_name`` — phase1_tasks.py:358-398: core prefixes,
  auto-generated suffixes, substring markers, ``eq_<n>`` last
  component.  (The reference also tests membership of the literal
  ``".Internal."`` in the dot-SPLIT parts — inert by construction
  since split parts contain no dots; reproduced for behavior parity.)
* ``choose_primary`` — phase3_tasks.py:246-397: heuristic sort by
  (name length, 16-type priority, name, id) over non-internal
  candidates, refined by hierarchical name-in-code matching and
  prefix relationships, with the heuristic choice breaking ties among
  shortest names.

Used per statement-group via ``applyInPandas`` at corpus build time
(grouped rows in → one chosen row out); exposed here as pure functions
and tested differentially against the reference implementation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from lean_explore_spark.functions.lean_text import hierarchical_name_matches

_AUTO_SUFFIXES = (
    ".noConfusion",
    ".noConfusionType",
    ".rec",
    ".recOn",
    ".casesOn",
    ".brecOn",
    ".below",
    ".IBelow",
    ".ndrec",
    ".ndrecOn",
    ".match_1",
    ".match_2",
    ".matcher",
    ".mk.inj",
    ".mk.inj_arrow",
    ".sizeOf_spec",
    "_uniq",
    ".internal",
)
_CORE_PREFIXES = ("Lean.", "Init.")

TYPE_PRIORITY = [
    "definition",
    "def",
    "theorem",
    "thm",
    "lemma",
    "inductive",
    "structure",
    "class",
    "instance",
    "abbreviation",
    "abbrev",
    "opaque",
    "axiom",
    "constructor",
    "ctor",
    "example",
]
_TYPE_RANK = {t: i for i, t in enumerate(TYPE_PRIORITY)}


def is_internal_name(name: str) -> bool:
    """P6: flag compiler-internal / auto-generated declaration names."""
    if name.startswith(_CORE_PREFIXES):
        return True
    if name.endswith(_AUTO_SUFFIXES):
        return True
    if "._match" in name or "._proof_" in name or "._example" in name:
        return True
    parts = name.split(".")
    if len(parts) > 1 and parts[-1].startswith("eq_") and parts[-1][3:].isdigit():
        return True
    if ".Internal." in parts:  # inert, mirrors the reference exactly
        return True
    return False


@dataclass
class Decl:
    id: int
    lean_name: str
    decl_type: str
    is_internal: bool = False


def choose_primary(
    decls: Sequence[Decl], block_statement_text: str
) -> Optional[Decl]:
    """F12: pick the representative declaration of a source block."""
    if not decls:
        return None
    pool = [d for d in decls if not d.is_internal] or list(decls)

    def heuristic_key(d: Decl):
        return (
            len(d.lean_name) if d.lean_name else float("inf"),
            _TYPE_RANK.get(d.decl_type, len(TYPE_PRIORITY) + 1),
            d.lean_name or "",
            d.id if d.id is not None else float("inf"),
        )

    pool = sorted(pool, key=heuristic_key)
    heuristic_choice = pool[0]

    found_names = hierarchical_name_matches(
        [d.lean_name for d in pool], block_statement_text
    )
    found = [d for d in pool if d.lean_name in found_names]
    if not found:
        return heuristic_choice
    if len(found) == 1:
        return found[0]

    # prefer declarations whose name is a strict prefix of another's
    prefixes = []
    for d1 in found:
        for d2 in found:
            if d1.id == d2.id or not d1.lean_name or not d2.lean_name:
                continue
            if len(d1.lean_name) < len(d2.lean_name) and d2.lean_name.startswith(
                d1.lean_name
            ):
                prefixes.append(d1)
                break
    eligible = prefixes if prefixes else found
    eligible = sorted(
        eligible,
        key=lambda d: (
            len(d.lean_name) if d.lean_name else float("inf"),
            d.id if d.id is not None else float("inf"),
        ),
    )
    if not eligible:
        return heuristic_choice
    best = eligible[0]
    shortest = len(best.lean_name) if best.lean_name else float("inf")
    tied = [
        d
        for d in eligible
        if (len(d.lean_name) if d.lean_name else float("inf")) == shortest
    ]
    if len(tied) > 1:
        for d in tied:
            if d.id == heuristic_choice.id:
                return d
    return best
