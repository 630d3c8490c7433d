"""CLI surface (reference `leanexplore ...` parity): build → search →
verify round trip through `python -m lean_explore_spark` main()."""

from __future__ import annotations

import json

from lean_explore_spark.__main__ import main
from tests.conftest import SF_SMOKE


def test_cli_build_search_verify(spark, tmp_path, capsys, monkeypatch):
    # reuse the session fixture instead of spinning a new JVM
    import lean_explore_spark.session as S

    monkeypatch.setattr(S, "get_spark", lambda **kw: spark)

    idx = str(tmp_path / "cli_idx")
    rc = main(
        [
            "build", "--input", f"{SF_SMOKE}/documents.parquet",
            "--output", idx, "--shards", "2", "--buckets", "4",
        ]
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and stats["n_docs"] == 500

    rc = main(
        ["search", "--index", idx, "--query", "fast table scan", "--limit", "5"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["count"] == 5
    scores = [r["score"] for r in out["results"]]
    assert scores == sorted(scores, reverse=True)

    rc = main(["verify", "--index", idx])
    fsck = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and fsck["ok"]


def test_cli_bench_agreement(spark, tmp_path, capsys, monkeypatch):
    """r4 VERDICT #8: the benchmarking entry points (multi-engine dump
    + rank-agreement analysis) are reachable from the CLI, matching
    the reference's gather_search_data/analyze_rankings ergonomics.
    This repo's engines are bit-exact, so every pair reports perfect
    agreement."""
    import lean_explore_spark.session as S

    monkeypatch.setattr(S, "get_spark", lambda **kw: spark)

    qfile = tmp_path / "queries.txt"
    qfile.write_text("fast table scan\ncustomer orders data\n")
    dump = tmp_path / "dump.jsonl"
    rc = main(
        [
            "bench-agreement", "--sf-dir", SF_SMOKE,
            "--queries", str(qfile), "--k", "5",
            "--engines", "wand,auto,df",
            "--out", str(dump),
            "--workdir", str(tmp_path / "wd"),
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["baseline"] == "wand"
    assert out["queries"] == 2
    assert set(out["engines"]) == {"wand", "auto", "df"}
    for pair, m in out["pairs"].items():
        assert m["exact"] == 1.0 and m["tau"] == 1.0 and m["rbo"] == 1.0, pair
    # the dump landed and has one line per (query, engine)
    assert len(dump.read_text().splitlines()) == 6
