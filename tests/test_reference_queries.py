"""Rank-identity over the full 299-query reference set
(benchmarking/queries.txt) at sf0.01 — the binding correctness target
(BASELINE.json north_rule; SURVEY.md §2.9)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query.search import SearchEngine
from tests.conftest import SF_ORACLE

QUERY_FILE = Path("/root/reference/benchmarking/queries.txt")


@pytest.fixture(scope="module")
def engine_and_oracle(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("refq") / "idx"
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=4).build(
        docs, resume=False
    )
    engine = SearchEngine(spark, str(out), preload=True)
    rows = duckdb.sql(
        f"select doc_id, text from '{SF_ORACLE}/documents.parquet' order by doc_id"
    ).fetchall()
    stats = oracle.build_stats(
        [r[0] for r in rows], (tokenize_stem(r[1]) for r in rows)
    )
    return engine, stats


@pytest.mark.skipif(not QUERY_FILE.exists(), reason="reference set absent")
def test_all_299_reference_queries_rank_identical(engine_and_oracle):
    engine, stats = engine_and_oracle
    queries = [q.strip() for q in QUERY_FILE.read_text().splitlines() if q.strip()]
    assert len(queries) >= 299  # file has no trailing newline: 300 lines
    mismatches = []
    for q in queries:
        toks = tokenize_stem(q)
        got = engine.search_tokens(toks, 50)
        want = [(d, s) for d, s in oracle.top_k(stats, toks, 50)]
        if got != want:
            mismatches.append(q)
    assert not mismatches, f"{len(mismatches)} mismatching queries: {mismatches[:5]}"
