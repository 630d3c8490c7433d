"""Seed-trained linear quality classifier — the model-based filtering
stage of a web-curation pipeline.

CCNet (Wenzek et al. 2019 §4.3) trains a fastText classifier on
Wikipedia-vs-crawl and keeps pages the model labels "Wikipedia-like";
DCLM (Li et al. 2024) shows this single stage is the largest quality
lever in a modern pretraining pipeline.  Offline (no fastText, no
model files) the deterministic equivalent is a Naive-Bayes log-odds
linear classifier: per-term weights learned from two labeled seed
corpora, applied corpus-wide as a mean-of-token-weights score.  A
linear bag-of-words model IS what fastText reduces to for 1-dim
"embeddings", so the operator family (train a small model on seeds,
broadcast it, score everything) has exactly the production shape.

The reference has no offline classifier; its learned-ranking analog
is the LLM-judge harness (`benchmarking/search_engine_ranker.py:40-50`)
which needs a network model — SURVEY §2.8 scopes that out.  This
module is the deterministic, contract-checkable stand-in.

Semantics
---------
``nb_logodds_weights(pos, neg, alpha)``: with ``c_p(t)``/``c_n(t)``
term counts in the positive/negative seeds, ``N_p``/``N_n`` total
seed tokens, ``V`` the union vocabulary::

    w(t) = ln((c_p(t)+a) / (N_p+aV)) - ln((c_n(t)+a) / (N_n+aV))

``classifier_score(docs, weights)``: ``score(d) = sum_t w(t) / n_d``
— the mean token log-odds.  Positive means "positive-seed-like";
threshold in log-odds space (monotone in the sigmoid probability, so
no ``exp`` is needed — and cross-engine ``exp`` is deliberately
avoided, see below).  Terms absent from both seeds contribute 0.

Cross-engine exactness (same contract as textstats.unigram_nll):
each ln is quantized FIRST — ``round(ln(...) * 1e6)`` as a bigint —
and the weight is the DIFFERENCE OF TWO QUANTIZED INTEGERS, so the
only float ops are single ``ln`` calls on identical doubles (the
primitive the unigram_nll row already proves identical across
Spark/DuckDB); per-doc accumulation is integer, and the final
division of two exact integers rounds identically everywhere.

Scale shape (audited, same plan as unigram_nll): the seeds are SMALL
by definition (that is the point of the stage — label thousands,
score billions), so weight training is two partial-aggregated
``groupBy(tok)`` over seed tokens plus one full-outer vocab join;
scoring is explode → ONE BroadcastHashJoin against the weight table
→ partial-aggregated ``groupBy(doc_id)`` integer sum.  Token text
crosses the wire only inside the seed aggregation.  A 100M-term
learned vocab is a few GB — still broadcastable on real executors;
pass ``broadcast_weights=False`` to let AQE pick a shuffle join when
it is not.  Zero-token docs ride the same aggregation via
``explode_outer``'s NULL row — no corpus-size retention join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lean_explore_spark.operators.textstats import SQL_TOKENS

_Q = 1_000_000.0  # micro-nat quantization, shared with unigram_nll


def _seed_counts(docs: DataFrame, name: str) -> DataFrame:
    return (
        docs.select(F.explode(F.expr(SQL_TOKENS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias(name))
    )


def nb_logodds_weights(
    pos_docs: DataFrame, neg_docs: DataFrame, alpha: float = 0.5
) -> DataFrame:
    """(tok, wq): per-term log-odds weight in integer micro-nats.

    ``wq = round(ln((c_p+a)/(N_p+aV))*1e6) - round(ln((c_n+a)/(N_n+aV))*1e6)``

    Laplace smoothing ``alpha`` keeps seed-exclusive terms finite and
    shrinks rare-term weights.  Both inputs are seed corpora (small);
    the full-outer vocab join shuffles once on tok — a one-time
    training cost, never corpus-scale.
    """
    j = _seed_counts(pos_docs, "cp").join(
        _seed_counts(neg_docs, "cn"), "tok", "full"
    ).select(
        "tok",
        F.coalesce("cp", F.lit(0)).cast("long").alias("cp"),
        F.coalesce("cn", F.lit(0)).cast("long").alias("cn"),
    )
    tot = j.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cn").cast("long").alias("nn"),
        F.count("*").cast("long").alias("v"),
    )
    a = F.lit(float(alpha))

    def lq(c, n):  # quantized ln((c+a)/(n+a*v)) — unigram_nll primitive
        return (
            F.round(
                F.log((F.col(c) + a) / (F.col(n) + a * F.col("v"))) * F.lit(_Q)
            )
            .cast("long")
        )

    return j.crossJoin(F.broadcast(tot)).select(
        "tok", (lq("cp", "np") - lq("cn", "nn")).alias("wq")
    )


def classifier_score(
    docs: DataFrame, weights: DataFrame, broadcast_weights: bool = True
) -> DataFrame:
    """(doc_id, n_tokens, clf_score): mean token log-odds, 6dp.

    ``clf_score > 0`` reads "more positive-seed-like than negative";
    downstream filters threshold this column directly (log-odds space
    — equivalent to any sigmoid-probability threshold).  Unknown
    tokens contribute 0 weight but DO count in ``n_tokens`` (a doc of
    out-of-vocabulary junk scores 0, not NaN).  Zero-token docs score
    0.0 with ``n_tokens = 0``.
    """
    toks = docs.select(
        "doc_id", F.explode_outer(F.expr(SQL_TOKENS)).alias("tok")
    )
    w = F.broadcast(weights) if broadcast_weights else weights
    return (
        toks.join(w, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum("wq"), F.lit(0)).cast("long").alias("s"),
            F.count("tok").cast("long").alias("n"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.when(
                F.col("n") > 0,
                F.round(F.col("s") / (F.col("n") * F.lit(_Q)), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("clf_score"),
        )
    )
