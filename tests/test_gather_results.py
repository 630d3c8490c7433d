"""Smoke test for the multi-engine result dumper (r3 VERDICT #8):
every serving path emits the same top-k for every query, and the
JSONL artifact is well-formed."""

from __future__ import annotations

import json

from jobs.gather_results import DEFAULT_QUERIES, run
from tests.conftest import SF_SMOKE

ENGINES = ["wand", "bulk", "blockmax", "df", "distributed"]


def test_gather_results_engines_agree(spark, tmp_path):
    out = tmp_path / "results.jsonl"
    lines = run(
        SF_SMOKE,
        DEFAULT_QUERIES[:3],
        5,
        ENGINES,
        str(out),
        str(tmp_path / "wd"),
    )
    assert len(lines) == 3 * len(ENGINES)
    by_q: dict = {}
    for ln in lines:
        assert len(ln["results"]) == 5
        by_q.setdefault(ln["query"], set()).add(
            tuple(
                (r["doc_id"], round(r["score"], 9)) for r in ln["results"]
            )
        )
    assert all(len(v) == 1 for v in by_q.values()), by_q
    dumped = [json.loads(s) for s in out.read_text().splitlines()]
    assert len(dumped) == len(lines)
    assert dumped[0]["engine"] == ENGINES[0]
