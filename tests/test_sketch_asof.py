"""KMV sketch properties and as-of join semantics (crafted cases the
contract's real-data oracle can't isolate)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from lean_explore_spark.operators import sketch as SK
from lean_explore_spark.operators.relational import asof_join
from tests.conftest import SF_ORACLE


def _toks(spark):
    return (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select(
            "lang",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '\\\\w+', 0)")
            ).alias("term"),
        )
    )


def test_kmv_estimate_reasonable(spark):
    rows = SK.kmv_distinct(_toks(spark), "lang", "term", k=32).collect()
    assert rows
    for r in rows:
        if r["n_exact"] >= 32:
            rel = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
            assert rel < 0.6, (r, rel)  # ~1/sqrt(k-2) std ≈ 18%
        else:
            assert r["kmv_estimate"] == float(r["n_exact"])


def test_kmv_merge_property(spark):
    """Per-partition k-minima union + re-cut == direct sketch (the
    property that makes KMV distributable)."""
    assert SK.kmv_merge_equivalence(
        _toks(spark).repartition(16), "lang", "term", k=32
    )


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2025-01-01T10:00:00")),  # after r1, before r2
            (2, 10, _ts("2025-01-01T12:00:00")),  # exactly at r2 (tie)
            (3, 10, _ts("2025-01-01T08:00:00")),  # before everything
            (4, 20, _ts("2025-01-01T09:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2025-01-01T09:00:00"), 1.0),
            (10, _ts("2025-01-01T12:00:00"), 2.0),
            (10, _ts("2025-01-01T12:00:00"), 5.0),  # dup ts → max wins
            (10, _ts("2025-01-01T23:00:00"), 9.0),  # later than all lefts
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", "value").collect()
    }
    assert got == {1: 1.0, 2: 5.0, 3: None, 4: None}
