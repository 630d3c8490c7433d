"""Distributed (one-task-per-shard) WAND must equal the local engine
and therefore the oracle, bit-for-bit."""

from __future__ import annotations

import pytest

from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.query.search import SearchEngine
from tests.conftest import SF_ORACLE

QUERIES = [
    "fast table scan merge join",
    "the",
    "group group group",
    "nonexistentterm",
    "slow query batch value row",
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("dist") / "idx"
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=4).build(
        docs, resume=False
    )
    return SearchEngine(spark, str(out), preload=True)


@pytest.mark.parametrize("query", QUERIES)
def test_distributed_equals_local(engine, query):
    tokens = tokenize_stem(query)
    local = engine.search_tokens(tokens, 20)
    dist = engine.search_tokens_distributed(tokens, 20)
    assert dist == local


def test_distributed_merge_is_take_ordered(engine):
    """r3 VERDICT #4: the per-shard top-k merge folds through Spark's
    TakeOrderedAndProject (per-partition k-heaps, driver merges only
    partition winners) — never k·S collected rows — and stays
    bit-exact."""
    plans = []
    engine._plan_probe = plans.append
    try:
        tokens = tokenize_stem("fast table scan merge join")
        dist = engine.search_tokens_distributed(tokens, 10)
    finally:
        engine._plan_probe = None
    assert dist == engine.search_tokens(tokens, 10)
    [df] = plans
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys


def test_distributed_fill_path(engine):
    # k exceeding matched docs: distributed fill must match local
    tokens = ["windowpag"]  # stemmed rare-ish term may or may not exist
    local = engine.search_tokens(tokens, engine.n_docs)
    dist = engine.search_tokens_distributed(tokens, engine.n_docs)
    assert dist == local
