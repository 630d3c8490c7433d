"""BM25Plus scoring as declarative DataFrame ops (the no-index path).

This is the Step-1 correctness anchor (SURVEY.md §7): score a query by
joining the (term, doc_id, tf) relation with the query terms.  The
packed-postings + block-max WAND engine (lean_explore_spark.query.wand)
must return exactly these numbers.

Plan shape: the per-term constants (df → idf, query multiplicity,
delta-floor constant C) are tiny — they are computed driver-side with
``math.log`` (bit-identical to the numpy oracle) and shipped back as a
broadcast literal relation, so the big (term, doc_id, tf) side is
touched by exactly two jobs: one semi-aggregate for df, one final
scoring pass.  Everything on the big side is JVM column arithmetic
inside whole-stage codegen; the broadcast join needs no shuffle of the
postings relation.

Formula per SURVEY.md §2.9 (rank_bm25 BM25Plus, reference
local/search.py:674-678): score = C + Σ_matched qtf·idf·tf·(k1+1)/(K+tf)
with C = Σ_{t∈q∩V} qtf·idf·δ added to every doc.
"""

from __future__ import annotations

import math
from typing import Sequence

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
    empty = not query_tokens
    qcounts: dict = {}
    for t in query_tokens or ():
        qcounts[t] = qcounts.get(t, 0) + 1

    if not empty:
        # driver-side constants: df per query term (one aggregate over
        # the pruned big side), then idf / C with math.log = oracle
        n_row = stats.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).collect()[0]
        n_docs, avgdl = int(n_row["n"]), float(n_row["avgdl"])
        df_rows = (
            tdf.where(F.col("term").isin(list(qcounts)))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in df_rows}
        weights = []  # (term, qtf*idf)
        c = 0.0
        for t, qtf in qcounts.items():
            if t in dfs:
                idf = math.log(n_docs + 1) - math.log(dfs[t])
                weights.append((t, float(qtf) * idf))
                c += float(qtf) * idf * delta
        empty = not weights

    if empty:
        out = stats.select("doc_id", F.lit(0.0).alias("score"))
        return out.orderBy(F.asc("doc_id")).limit(k)

    qrel = spark.createDataFrame(weights, "term string, w double")
    matched = (
        tdf.join(F.broadcast(qrel), "term")
        .join(stats, "doc_id")
        .select(
            "doc_id",
            (
                F.col("w")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("doc_len") / F.lit(avgdl)
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
        .select(
            "doc_id",
            (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(c)).alias("score"),
        )
    )
    if round_to is not None:
        scored = scored.select(
            "doc_id", F.round("score", round_to).alias("score")
        )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def score_candidates_df(
    spark: SparkSession,
    tdf: DataFrame,
    stats: DataFrame,
    query_tokens: Sequence[str],
    candidates: DataFrame,
    k1: float = K1,
    b: float = B,
    delta: float = DELTA,
) -> DataFrame:
    """(doc_id, score) for an EXPLICIT candidate relation — the
    declarative twin of SearchEngine.score_candidates (reference
    search.py:670-678 scores only the FAISS candidates).

    Scale shape (r2 VERDICT #1 fix): the candidate set (≤ a few hundred
    rows) is BROADCAST into the term-pruned postings scan — no global
    sort, no corpus-sized broadcast, no corpus-wide score
    materialization.  The only Exchange is the candidate-row groupBy;
    scores are bit-identical to ``score_query`` on the same docs (same
    per-term constants, same JVM arithmetic)."""
    cand = candidates.select("doc_id").distinct()

    n_row = stats.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(n_row["n"]), float(n_row["avgdl"])

    qcounts: dict = {}
    for t in query_tokens or ():
        qcounts[t] = qcounts.get(t, 0) + 1
    weights = []
    c = 0.0
    if qcounts:
        df_rows = (
            tdf.where(F.col("term").isin(list(qcounts)))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in df_rows}
        for t, qtf in qcounts.items():
            if t in dfs:
                idf = math.log(n_docs + 1) - math.log(dfs[t])
                weights.append((t, float(qtf) * idf))
                c += float(qtf) * idf * delta

    # candidate doc lens: broadcast the tiny candidate set against the
    # (big) stats relation — stream-side scan, k result rows
    cand_stats = stats.join(F.broadcast(cand), "doc_id").select(
        "doc_id", "doc_len"
    )
    if not weights:
        return cand_stats.select("doc_id", F.lit(0.0).alias("score"))

    qrel = spark.createDataFrame(weights, "term string, w double")
    matched = (
        tdf.join(F.broadcast(qrel), "term")
        .join(F.broadcast(cand_stats), "doc_id")
        .select(
            "doc_id",
            (
                F.col("w")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("doc_len") / F.lit(avgdl)
                    )
                    + F.col("tf")
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("s"))
    )
    return (
        cand_stats.select("doc_id")
        .join(F.broadcast(matched), "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(c)).alias("score"),
        )
    )
