"""Serving-latency harness (jobs/serving_latency.py, r4 VERDICT #5):
the three serving modes stay rank-identical, and the cold path stays
in the per-query-pruned-read latency class — a regression guard
against anything corpus-sized sneaking back into cold serving (the r1
VERDICT scale-killer class).  Wall-clock asserts are deliberately
generous: this VM has ±2-3× CPU-steal noise (BENCH.md §0)."""

from __future__ import annotations

import sys

import pytest

from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.query.search import SearchEngine
from tests.conftest import SF_SMOKE

sys.path.insert(0, "/root/repo/jobs")


@pytest.fixture(scope="module")
def served_index(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("slat") / "idx"
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=8).build(
        docs, resume=False
    )
    return str(out)


def test_modes_rank_identical_and_cold_bounded(spark, served_index):
    from serving_latency import measure

    from bench import load_queries

    queries = load_queries()[:30]
    pre = SearchEngine(spark, served_index, preload=True)
    cold = SearchEngine(spark, served_index, preload=False)

    for q in queries[:10]:
        assert cold.search(q, 20) == pre.search(q, 20), q
        assert pre.search_distributed(q, 20) == pre.search(q, 20), q

    m_pre = measure(lambda q, k: pre.search(q, k), queries, 20, repeats=2)
    m_cold = measure(lambda q, k: cold.search(q, k), queries, 20, repeats=2)
    # preloaded serves from driver memory: single-digit ms typical,
    # 250 ms only under extreme steal
    assert m_pre["p50_ms"] < 250, m_pre
    # cold = a few pruned Spark reads per query (~0.2 s class); a
    # corpus preload, per-query rebuild, or unpruned scan regression
    # lands in seconds
    assert m_cold["p50_ms"] < 2500, m_cold


def test_percentile_helper():
    from serving_latency import percentiles

    p = percentiles([i / 1000 for i in range(1, 101)])
    assert p["p50_ms"] == 51.0
    assert p["p95_ms"] == 96.0
