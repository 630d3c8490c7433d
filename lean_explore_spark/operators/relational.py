"""Relational operator demos mapping SURVEY.md §2 inventory classes to
idiomatic Spark plans over the TPC-H-ish test tables.

Each function is one driver-contract query with a DuckDB oracle; the
point is the PLAN SHAPE (broadcast joins for dims, partial aggregation,
windows without extra shuffles), mirroring how the reference's
hand-rolled lookups/joins/dedups (SURVEY.md §2.3-§2.6) become
declarative Spark.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3 + A4: two broadcast dim joins then one partial-agg rollup.

    customer ⨝ nation ⨝ region → per-region customer count + avg
    balance.  nation/region are broadcast (no shuffle of customer).
    """
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/O4: anti-join (the reference's stale-delete diff,
    phase1_tasks.py:649+) — customers that placed no orders, per nation."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/W1/W2: smallest-covering-span pick analog
    (phase2_tasks.py:664-670) — top-2 orders per customer by price,
    one window, no self-join."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
            "rn",
        )
    )


def shipments_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: interval/containment join (the decl↔AST-span join,
    phase2_tasks.py:640-670) — lineitems shipped within 30 days of
    their order date, count per priority."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).where(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lineitems")
    )


def acctbal_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: per-nation min-max normalization with the reference's
    degenerate-range rule (local/search.py:687-753: zero range → 0.0)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_nationkey")
    lo, hi = F.min("c_acctbal").over(w), F.max("c_acctbal").over(w)
    norm = F.when(hi - lo > 0, (F.col("c_acctbal") - lo) / (hi - lo)).otherwise(
        F.lit(0.0)
    )
    return c.select(
        "c_custkey", "c_nationkey", F.round(norm, 6).alias("norm_acctbal")
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4/A7 (TPC-H Q1 shape): wide partial-aggregated rollup —
    every aggregate is map-side combined before the single shuffle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2025-06-30"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-class on the events stream table: session = gap > 30 min per
    user (lag + cumulative sum window), count sessions per user for
    the first 200 users."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microsecond gap straight on the TIMESTAMP_NTZ column:
    # timestampdiff is wall-clock arithmetic — no session-timezone
    # dependence, no second-truncation (events carry µs precision)
    sess = (
        e.where(F.col("user_id") < 200)
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
        )
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.col("gap_us") > 1_800_000_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    return sess.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_col: str,
) -> DataFrame:
    """AS-OF join (brief §custom-ops): attach to each left row the
    ``value_col`` of the LATEST right row with right.ts ≤ left.ts for
    the same key — the classic point-in-time lookup Spark lacks as a
    primitive.

    Composition (no range self-join, no per-key collect): right rows
    are deduped per (key, ts) (max value — a deterministic tie rule),
    tagged and UNIONed with the left, then one window pass carries the
    last non-null right value forward (``last(ignorenulls)`` over
    rows-unbounded-preceding).  ONE shuffle by key — at 10^12 rows this
    is a sort within key partitions, not an interval join explosion.
    Ties at equal ts: the right row applies (asof ≤ semantics, right
    sorts before left at the same instant).
    """
    r = (
        right.groupBy(key, ts)
        .agg(F.max(value_col).alias("_asof_v"))
        .select(key, F.col(ts).alias("_ts"), "_asof_v", F.lit(0).alias("_src"))
    )
    l = left.withColumn("_ts", F.col(ts)).withColumn(
        "_src", F.lit(1)
    ).withColumn("_asof_v", F.lit(None).cast(r.schema["_asof_v"].dataType))
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn(
        "asof_value", F.last("_asof_v", ignorenulls=True).over(w)
    )
    return out.where(F.col("_src") == 1).drop("_ts", "_src", "_asof_v")


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract wrapper for asof_join: each 'view' event gets the value
    of the user's most recent prior-or-simultaneous 'purchase' event
    (point-in-time attribution), -1 when none exists."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id") < 100
    )
    views = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(views, purchases, key="user_id", ts="ts", value_col="value")
    return joined.select(
        "event_id",
        "user_id",
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 6).alias("asof_value"),
    )


def _default_salt_expr(df: DataFrame):
    """Deterministic per-row salt: all-columns hash, mixed with the
    hidden ``_metadata`` (file_path, row_index) scan column when the
    plan still exposes one — stable across task retries and
    re-partitionings, and spreads byte-identical rows."""
    try:
        # raises at analysis when df is not a plain file scan
        # (joined/aggregated plans lose the hidden column)
        df.select("_metadata.file_path", "_metadata.row_index")
        return F.xxhash64(
            F.col("_metadata.file_path"),
            F.col("_metadata.row_index"),
            *[F.col(c) for c in df.columns],
        )
    except Exception:
        return F.xxhash64(*[F.col(c) for c in df.columns])


def salted_two_stage_count(
    df: DataFrame,
    key_col: str,
    salt_buckets: int = 16,
    salt_expr=None,
) -> DataFrame:
    """Salted two-stage aggregation (north_rule's named skew defuse, in
    its generic form): stage 1 groups by (key, salt) — the hot key's
    rows split across ``salt_buckets`` reducers — stage 2 merges the
    partial counts per key.  Correct for any algebraic aggregate;
    counts here.  The index builder's doc-range sharding is the
    specialized version of this (salt = doc range, which keeps shards
    concatenable); this operator is the drop-in for aggregations with
    no natural range key.  The salt is a deterministic row hash (all
    columns), not monotonically_increasing_id: stage retries and
    re-partitionings re-derive the SAME salt per row, keeping shuffle
    outputs byte-stable like the rest of the repo.

    Limitation (ADVICE r3): fully IDENTICAL rows all hash to one salt
    bucket, so an all-columns hash cannot spread a duplicate-heavy hot
    key.  For FILE-BACKED inputs this is closed automatically (r4
    VERDICT #7): when the plan still exposes the hidden ``_metadata``
    scan column, the default salt mixes in (file_path, row_index) — a
    per-row disambiguator that task retries and re-partitionings
    re-derive identically (unlike monotonically_increasing_id), so
    even byte-identical rows spread.  For non-file inputs with heavy
    duplicate rows, pass ``salt_expr`` with a source-stable
    disambiguator.  Determinism of the RESULT is unaffected either
    way — the salt only routes partials."""
    if salt_expr is None:
        salt_expr = _default_salt_expr(df)
    salted = df.withColumn("_salt", F.pmod(salt_expr, F.lit(salt_buckets)))
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("_partial")
    )
    return partial.groupBy(key_col).agg(F.sum("_partial").alias("n"))
