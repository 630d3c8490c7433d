"""Rank-identity of the DataFrame BM25 scorer vs the numpy oracle.

The DataFrame path sums per-term contributions in shuffle order, so
float64 sums can differ from the oracle's query-term-major order in
the last ulp; we assert scores to 1e-9 relative and require doc_id
equality wherever the ranking gap is above that noise floor.  The
packed-index WAND engine (numpy, controlled accumulation order) is
held to bit-exact equality in its own test module.
"""

from __future__ import annotations

import duckdb
import pytest

from __spark_entry__ import _docs
from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.operators import analyze as A
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query import df_scorer
from tests.conftest import SF_ORACLE

QUERIES = [
    "fast table scan merge join",
    "customer orders data",
    "spark streaming window",
    "group group group",  # multiplicity
    "nonexistentterm",  # absent from corpus
    "the",  # stopword-ish, in every doc
    "slow query batch value row",
]


@pytest.fixture(scope="module")
def corpus_stats():
    rows = duckdb.sql(
        f"select doc_id, text from '{SF_ORACLE}/documents.parquet' order by doc_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    return oracle.build_stats(ids, (tokenize_stem(r[1]) for r in rows))


@pytest.fixture(scope="module")
def spark_relations(spark):
    analyzed = A.analyze(_docs(spark, SF_ORACLE), stem=True).cache()
    tdf = A.term_doc_tf(analyzed)
    stats = A.doc_stats(analyzed)
    yield tdf, stats
    analyzed.unpersist()


@pytest.mark.parametrize("query", QUERIES)
def test_df_scorer_matches_oracle(spark, corpus_stats, spark_relations, query):
    tdf, stats = spark_relations
    tokens = tokenize_stem(query)
    k = 25
    got = df_scorer.score_query(spark, tdf, stats, tokens, k=k).collect()
    want = oracle.top_k(corpus_stats, tokens, k)
    assert len(got) == len(want)
    for rank, (row, (odoc, oscore)) in enumerate(zip(got, want)):
        assert row["score"] == pytest.approx(oscore, rel=1e-9, abs=1e-12), (
            f"rank {rank}: score {row['score']} != {oscore}"
        )
    # doc ids must agree wherever the score gap exceeds float noise
    for rank in range(len(got)):
        gap_ok = all(
            abs(want[rank][1] - want[j][1]) > 1e-9
            for j in (rank - 1, rank + 1)
            if 0 <= j < len(want)
        )
        if gap_ok:
            assert got[rank]["doc_id"] == want[rank][0], f"rank {rank}"
    # and the score-tier doc_id multisets must match even among ties
    def tiers(pairs):
        out = {}
        for d, s in pairs:
            out.setdefault(round(s, 6), set()).add(d)
        return out

    assert tiers([(r["doc_id"], r["score"]) for r in got]) == tiers(want)
