"""Training-set assembly: domain mixing and deterministic global
shuffle — the two stages between "curated corpus" and "tokenizer
input" in a pretraining data pipeline.

``domain_mix`` is the data-mixing stage (The Pile's per-source
epochs, DoReMi/DCLM domain weights): given relative per-domain
weights and a total token budget, sample each domain at the rate that
hits its share of the budget, capped at keep-everything.  ``shuffle
rank`` is the global example shuffle every trainer needs: a
deterministic pseudorandom total order (and fixed-size shard
assignment) over the corpus, reproducible across runs, partitionings
and engines.

The reference has neither (it is a search engine, not a data
pipeline); both are brief-mandated training-data operators.  Hashing
follows the repo's standard oracle-expressible fold —
``fold15(md5(salt:doc_id))`` = the first 15 hex chars of the md5 as a
60-bit integer — the same primitive ``textstats.hash_sample`` and the
``stratified_sample`` contract row already prove cross-engine exact.

Scale shape
-----------
* ``domain_mix``: one narrow per-doc token count, ONE tiny
  partial-aggregated groupBy(domain) (domain cardinality ≪ corpus),
  rates derived in all-integer arithmetic on that tiny relation, then
  a broadcast join + narrow hash-threshold filter.  The corpus is
  never shuffled.
* ``shuffle_rank``: a two-phase global prefix rank keyed on VALUE
  buckets — the top bits of the 60-bit hash — never on physical
  partition ids.  Buckets are order-preserving (bucket b's hashes all
  sort before bucket b+1's) and uniform (md5), so a per-bucket
  ``row_number`` window runs in parallel and a tiny per-bucket count
  prefix turns local ranks global.  The value key is the load-bearing
  choice: the first implementation keyed on
  ``spark_partition_id()`` over a ``repartitionByRange`` exchange,
  and because the offsets subtree RE-EVALUATES its input, AQE laid
  the two evaluations out differently inside a larger plan — at 3.2M
  docs inside the composed pipeline the offsets joined to the wrong
  partitions (duplicate + missing ranks, caught by the --shards
  fsck) even though the same code was correct standalone.  A pure
  row-function key cannot depend on layout, so double evaluation is
  harmless by construction.
"""

from __future__ import annotations

from typing import Dict

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lean_explore_spark.operators.textstats import SQL_TOKENS

PPM = 1_000_000


def fold15(col: Column, salt: str) -> Column:
    """60-bit integer: first 15 hex chars of md5(f"{salt}:{col}").

    The repo's standard cross-engine hash (hash_sample /
    stratified_sample contract rows); uniform on [0, 2^60).
    """
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def domain_rates(
    docs: DataFrame,
    weights_ppm: Dict[str, int],
    budget_tokens: int,
    domain_col: str = "source",
) -> DataFrame:
    """(domain, domain_tokens, rate_ppm): per-domain sampling rate.

    ``rate_ppm = min(PPM, (budget_tokens * w_ppm) div domain_tokens)``
    — the rate at which hash-sampling the domain yields (in
    expectation) ``budget_tokens * w_ppm / PPM`` tokens.  Weights are
    RELATIVE shares in parts-per-million; they need not sum to PPM
    (the budget is apportioned per domain independently; a domain
    whose share exceeds its size is kept whole — the cap, not
    upsampling).  Domains absent from ``weights_ppm`` get rate 0 and
    are dropped.  Empty domains (0 tokens) are kept whole: their docs
    cost nothing.

    All-integer arithmetic end to end (CLAUDE.md 2^62 invariant), so
    ``budget_tokens * max(w_ppm)`` must stay under 2^63 — i.e. budgets
    up to ~9·10^12 tokens at full-weight PPM.  Above that, express
    weights per-mille and scale PPM accordingly; the guard below makes
    the overflow impossible to hit silently.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    wmax = max(weights_ppm.values(), default=0)
    if wmax and budget_tokens > (2**63 - 1) // wmax:
        raise ValueError(
            "budget_tokens * max(weight_ppm) overflows int64 — "
            "rescale weights to a coarser unit"
        )
    w = None
    for k, v in sorted(weights_ppm.items()):
        if not (0 <= int(v) <= PPM):
            raise ValueError(f"weight out of [0, {PPM}]: {k}={v}")
        cond = F.col(domain_col) == k
        w = F.when(cond, int(v)) if w is None else w.when(cond, int(v))
    w = w.otherwise(0) if w is not None else F.lit(0)
    tot = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.size(F.expr(SQL_TOKENS)).cast("long").alias("_n"),
            w.cast("long").alias("_w"),
        )
        .groupBy("domain")
        .agg(
            F.sum("_n").cast("long").alias("domain_tokens"),
            F.max("_w").cast("long").alias("_w"),  # constant per domain
        )
    )
    return tot.select(
        "domain",
        "domain_tokens",
        F.when(F.col("domain_tokens") == 0, F.lit(PPM))
        .otherwise(
            F.least(
                F.lit(PPM),
                F.expr(
                    f"({budget_tokens} * _w) div domain_tokens"
                ),
            )
        )
        .cast("long")
        .alias("rate_ppm"),
    )


def domain_mix(
    docs: DataFrame,
    weights_ppm: Dict[str, int],
    budget_tokens: int,
    domain_col: str = "source",
    salt: str = "mix0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample the corpus to a target domain mixture.

    Keeps a doc iff ``fold15(md5(salt:doc_id)) mod PPM <
    rate_ppm(domain)`` — deterministic, content-addressed, decidable
    per row once the tiny rate table is joined (broadcast).  Returns
    (doc_id, domain, n_tokens, rate_ppm) for the KEPT docs; expected
    kept tokens per domain = ``min(domain_tokens, budget * w / PPM)``.

    Plan: tiny groupBy(domain) → broadcast join → narrow filter; the
    corpus never shuffles, so the stage costs one scan at any size.
    """
    rates = domain_rates(docs, weights_ppm, budget_tokens, domain_col)
    h = fold15(F.col(id_col), salt) % PPM
    return (
        docs.select(
            id_col,
            F.col(domain_col).alias("domain"),
            F.size(F.expr(SQL_TOKENS)).cast("long").alias("n_tokens"),
        )
        .join(F.broadcast(rates.drop("domain_tokens")), "domain")
        .where(h < F.col("rate_ppm"))
        .select(id_col, "domain", "n_tokens", "rate_ppm")
    )


def shuffle_rank(
    docs: DataFrame,
    salt: str = "shuf0",
    shard_docs: int = 0,
    id_col: str = "doc_id",
    keep_cols: bool = False,
    bucket_bits: int = 12,
) -> DataFrame:
    """(doc_id, shuffle_rank[, shard]): deterministic global shuffle.

    ``shuffle_rank`` is the 0-based position of the doc in the total
    order ``(fold15(md5(salt:doc_id)), doc_id)`` — a reproducible
    pseudorandom permutation of the corpus (the doc_id tie-break only
    fires on 60-bit hash collisions, keeping the order total either
    way).  With ``shard_docs > 0`` adds ``shard = rank div
    shard_docs``: contiguous fixed-size output shards, the unit a
    trainer's data loader consumes.  Different ``salt`` → independent
    permutation (new data order per training run).

    Scale: one hash shuffle (the per-bucket window) + a tiny
    per-bucket count prefix — see module docstring; integer ``div``
    for the shard split (ranks reach 10^13).  ``bucket_bits`` sizes
    the parallelism: 2^bits buckets, uniform by the md5 hash (12 bits
    = 4096 buckets; raise for >10^10-row corpora so per-bucket windows
    stay small).  Bucket keys are pure row functions — NEVER physical
    partition ids — so the plan is correct under any AQE layout and
    under re-evaluation (module docstring: the 3.2M pipeline
    regression that forced this design).

    ``keep_cols=True`` threads EVERY input column through the rank
    computation and returns them alongside the rank — the emit-sink
    shape: ranking ids and joining back would re-traverse the whole
    upstream lineage a second time (two full pipeline computations at
    corpus scale, and any ``observe`` counter in that lineage would
    double-fire inside the self-joined action), whereas keep_cols is
    ONE traversal with the payload riding the single hash shuffle it
    must make anyway to be written in shuffled order.
    """
    from pyspark.sql import Window

    cols = list(docs.columns) if keep_cols else [id_col]
    for reserved in ("_h", "_b", "_local_rank"):
        if reserved in cols:
            raise ValueError(f"input column {reserved!r} is reserved")
    if not 1 <= int(bucket_bits) <= 40:
        raise ValueError("bucket_bits out of [1, 40]")
    hashed = docs.select(
        *cols, fold15(F.col(id_col), salt).alias("_h")
    ).withColumn(
        # top bits of the 60-bit hash: order-preserving value bucket
        "_b",
        F.shiftright(F.col("_h"), 60 - int(bucket_bits)).cast("long"),
    )
    w = Window.partitionBy("_b").orderBy("_h", id_col)
    local = hashed.withColumn("_local_rank", F.row_number().over(w))
    counts = hashed.groupBy("_b").agg(F.count("*").alias("_c"))
    a = counts.alias("a")
    b = counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._b") < F.col("a._b"), "left")
        .groupBy(F.col("a._b").alias("_b"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_offset"))
    )
    out = local.join(F.broadcast(offsets), "_b").select(
        *cols,
        (F.col("_offset") + F.col("_local_rank") - 1)
        .cast("long")
        .alias("shuffle_rank"),
    )
    if shard_docs > 0:
        out = out.withColumn(
            "shard",
            F.expr(f"shuffle_rank div {int(shard_docs)}").cast("long"),
        )
    return out
