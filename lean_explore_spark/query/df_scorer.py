"""BM25Plus scoring as declarative DataFrame ops (the no-index path).

This is the Step-1 correctness anchor (SURVEY.md §7): score a query by
joining the (term, doc_id, tf) relation with the query terms — all
JVM-side, whole-stage-codegen'd column arithmetic; the only Python is
query tokenization on the driver.  The packed-postings + block-max
WAND engine (lean_explore_spark.query.wand) must return exactly these
numbers.

Scale shape: the query-terms side is a tiny literal relation —
Catalyst broadcast-joins it against the postings relation, so the scan
of (term, doc_id, tf) is filtered to the query's terms with no shuffle
of the big side (semi-join pushdown); the final groupBy(doc_id) only
aggregates matched rows.

Formula per SURVEY.md §2.9 (rank_bm25 BM25Plus, reference
local/search.py:674-678): score = C + Σ_matched qtf·idf·tf·(k1+1)/(K+tf)
with C = Σ_{t∈q∩V} qtf·idf·δ added to every doc.
"""

from __future__ import annotations

from typing import List, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

K1 = 1.5
B = 0.75
DELTA = 1.0


def score_query(
    spark: SparkSession,
    tdf: DataFrame,
    stats: DataFrame,
    query_tokens: Sequence[str],
    k: int = 50,
    k1: float = K1,
    b: float = B,
    delta: float = DELTA,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) for pre-tokenized query tokens.

    ``tdf``: (term, doc_id, tf); ``stats``: (doc_id, doc_len).
    Ties break by doc_id ascending (SURVEY.md §2.9 tie-break pin).
    """
    if not query_tokens:
        out = stats.select(
            "doc_id", F.lit(0.0).alias("score")
        )
        return out.orderBy(F.asc("doc_id")).limit(k)

    # query-term relation with multiplicity
    qcounts: dict = {}
    for t in query_tokens:
        qcounts[t] = qcounts.get(t, 0) + 1
    qterms = spark.createDataFrame(
        [(t, float(c)) for t, c in qcounts.items()], "term string, qtf double"
    )

    n_avg = stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )

    # df restricted to query terms: broadcast the tiny query relation,
    # aggregate only matching postings rows
    q_df = (
        tdf.join(F.broadcast(qterms), "term")
        .groupBy("term", "qtf")
        .agg(F.count("*").alias("df"))
    )
    q_idf = q_df.crossJoin(F.broadcast(n_avg)).select(
        "term",
        "qtf",
        (F.log(F.col("n_docs") + F.lit(1.0)) - F.log("df")).alias("idf"),
    )

    # additive delta-floor constant over corpus-present query terms
    const = q_idf.agg(
        F.coalesce(F.sum(F.col("qtf") * F.col("idf") * F.lit(delta)), F.lit(0.0)).alias(
            "c"
        )
    )

    matched = (
        tdf.join(F.broadcast(q_idf), "term")
        .join(stats, "doc_id")
        .crossJoin(F.broadcast(n_avg))
        .select(
            "doc_id",
            (
                F.col("qtf")
                * F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("doc_len") / F.col("avgdl")
                    )
                    + F.col("tf")
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("s"))
    )

    scored = (
        stats.select("doc_id")
        .join(matched, "doc_id", "left")
        .crossJoin(F.broadcast(const))
        .select(
            "doc_id",
            (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("c")).alias("score"),
        )
    )
    if round_to is not None:
        scored = scored.select(
            "doc_id", F.round("score", round_to).alias("score")
        )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
