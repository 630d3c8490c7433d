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


def test_distributed_fill_path(engine):
    # k exceeding matched docs: distributed fill must match local
    tokens = ["windowpag"]  # stemmed rare-ish term may or may not exist
    local = engine.search_tokens(tokens, engine.n_docs)
    dist = engine.search_tokens_distributed(tokens, engine.n_docs)
    assert dist == local
