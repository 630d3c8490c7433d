"""Simulates the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB on row count, column names, and
order-insensitive values at sf0.01 (driver contract in
__spark_entry__.py; gate semantics per the repo brief)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_ORACLE


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    # unify null representations (None / NaN / pd.NA) across engines
    for col in pdf.columns:
        if pdf[col].dtype == object or str(pdf[col].dtype).startswith("string"):
            pdf[col] = pdf[col].astype(object)
            pdf[col] = pdf[col].where(pd.notna(pdf[col]), "\x00NULL")
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            for i, (a, b) in enumerate(zip(sv, dv)):
                assert (math.isnan(a) and math.isnan(b)) or a == b, (
                    f"{name}.{col}[{i}]: {a!r} != {b!r}"
                )
        else:
            mism = (sv != dv)
            assert not mism.any(), (
                f"{name}.{col}: first mismatch at "
                f"{mism.idxmax()}: {sv[mism.idxmax()]!r} != {dv[mism.idxmax()]!r}"
            )


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    oracles = E.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: no SQL oracle (rows-only check)")
    spark_df = E.queries()[name](spark, SF_ORACLE)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck.execute(oracles[name]).fetchdf()
    _compare(spark_pdf, duck_pdf, name)


# Keys added since the most recent driver round file was written —
# they can't appear in it yet.  Update when adding contract queries;
# clear once the next round file lands.  Everything else exported by
# queries() MUST have a green row in the latest CORRECTNESS_r*.json:
# round 6 silently dropped ivf_topk + embed_texts (VERDICT r6 #1) and
# nothing failed — this makes a driver omission impossible to miss.
NEW_SINCE_LAST_ROUND: set[str] = {
    "gopher_quality",
    "c4_quality",
    "unigram_nll",
    "line_dedup",
    "decontaminate",
    "pack_sequences",
    "pii_scrub",
    "classifier_score",
    "host_stats",
    "line_dedup_doc",
    "domain_mix",
    "shuffle_rank",
    "length_quantiles",
    "bpe_tokens",
    "chunk_passages",
    "novel_docs",
}

# Documented rows-only contract entries: genuinely non-SQL-expressible
# ops (the brief's exemption).  bpe_tokens: BPE's iterated
# data-dependent merges cannot run in one DuckDB query; correctness is
# pinned by the naive-trainer differential in tests/test_bpe.py.
ROWS_ONLY: set[str] = {"bpe_tokens"}

# The r6 driver omission of record (VERDICT r6 #1): both r5-green,
# code untouched since, both exercised by the parametrized gate above.
# Clear once a round file containing them lands.
DRIVER_OMITTED_LAST_ROUND: set[str] = {"ivf_topk", "embed_texts"}


def test_every_query_has_oracle():
    missing = set(E.queries()) - set(E.oracle_sql()) - ROWS_ONLY
    assert not missing, (
        f"queries() entries without an oracle_sql() twin: {sorted(missing)} "
        "(add the oracle, or document the rows-only exemption in "
        "ROWS_ONLY above)"
    )


def test_latest_round_file_covers_every_query():
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    rounds = sorted(repo.glob("CORRECTNESS_r*.json"))
    if not rounds:
        pytest.skip("no driver round files yet")
    latest = rounds[-1]
    rows = json.loads(latest.read_text())
    missing = (
        set(E.queries())
        - set(rows)
        - NEW_SINCE_LAST_ROUND
        - DRIVER_OMITTED_LAST_ROUND
    )
    assert not missing, (
        f"{latest.name} is missing contract rows for {sorted(missing)} — "
        "driver omission (VERDICT r6 #1) or stale NEW_SINCE_LAST_ROUND"
    )
    bad = {
        k: v
        for k, v in rows.items()
        if k in E.queries()
        and (
            v.get("err") is not None
            or v.get("rows_match") is False
            or v.get("schema_match") is False
            or v.get("hash_match") is False
        )
    }
    assert not bad, f"{latest.name} has non-green rows: {bad}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score"]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rows_only_queries_are_deterministic(spark):
    """Rows-only entries have no oracle, so pin the next-best thing:
    two independent runs produce identical values (the driver's
    weaker check then at least hashes stably across rounds)."""
    for name in sorted(ROWS_ONLY):
        fn = E.queries()[name]
        a = _normalize(fn(spark, SF_ORACLE).toPandas())
        b = _normalize(fn(spark, SF_ORACLE).toPandas())
        assert a.equals(b), name
        assert len(a) > 0, name
