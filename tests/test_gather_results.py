"""Smoke test for the multi-engine result dumper (r3 VERDICT #8):
every serving path emits the same top-k for every query, and the
JSONL artifact is well-formed."""

from __future__ import annotations

import json

from jobs.gather_results import DEFAULT_QUERIES, run
from tests.conftest import SF_SMOKE

ENGINES = ["wand", "bulk", "blockmax", "df", "distributed", "distributed_batch"]


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


def test_analyze_rankings_metrics():
    """Pure-function metrics: identical rankings score perfect;
    disjoint rankings score zero overlap; a reversal flips tau."""
    from jobs.analyze_rankings import analyze, kendall_tau, rbo

    assert kendall_tau([1, 2, 3], [1, 2, 3]) == 1.0
    assert kendall_tau([1, 2, 3], [3, 2, 1]) == -1.0
    assert rbo([1, 2, 3], [1, 2, 3]) == 1.0
    assert rbo([1, 2], [3, 4]) == 0.0

    lines = [
        {"query": "q", "engine": "wand", "results": [{"doc_id": d} for d in (1, 2, 3)]},
        {"query": "q", "engine": "df", "results": [{"doc_id": d} for d in (1, 2, 3)]},
        {"query": "q", "engine": "rev", "results": [{"doc_id": d} for d in (3, 2, 1)]},
    ]
    out = analyze(lines, baseline="wand")
    assert out["pairs"]["wand-vs-df"] == {
        "exact": 1.0, "overlap": 1.0, "tau": 1.0, "rbo": 1.0
    }
    rev = out["pairs"]["wand-vs-rev"]
    assert rev["exact"] == 0.0 and rev["overlap"] == 1.0 and rev["tau"] == -1.0
    assert 0 < rev["rbo"] < 1


def test_analyze_rankings_on_real_dump(spark, tmp_path):
    """End-to-end: engines in this repo agree perfectly, so every
    agreement metric is 1.0 against the WAND baseline."""
    from jobs.analyze_rankings import analyze

    lines = run(
        SF_SMOKE,
        DEFAULT_QUERIES[:2],
        5,
        ["wand", "blockmax", "distributed"],
        None,
        str(tmp_path / "wd2"),
    )
    out = analyze(lines, baseline="wand")
    for pair, m in out["pairs"].items():
        assert m == {"exact": 1.0, "overlap": 1.0, "tau": 1.0, "rbo": 1.0}, pair


def test_wand_engine_runs_classic_loop(spark, tmp_path, monkeypatch):
    """ADVICE r4 (low): the engine named 'wand' must actually run
    mode='wand' (the classic document-at-a-time loop), and 'auto' is
    its own engine — the dump's labels mean what they say."""
    from lean_explore_spark.query.search import SearchEngine

    seen = []
    orig = SearchEngine.search_tokens

    def spy(self, tokens, k=50, mode="auto"):
        seen.append(mode)
        return orig(self, tokens, k, mode=mode)

    monkeypatch.setattr(SearchEngine, "search_tokens", spy)
    lines = run(
        "/root/testdata/sf0.001",
        ["data page"],
        5,
        ["wand", "auto", "bulk", "blockmax"],
        None,
        str(tmp_path),
    )
    assert seen == ["wand", "auto", "bulk", "blockmax"]
    res = [tuple((r["doc_id"], r["score"]) for r in ln["results"]) for ln in lines]
    assert len(set(res)) == 1  # all four modes bit-identical
