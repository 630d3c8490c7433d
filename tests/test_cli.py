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
