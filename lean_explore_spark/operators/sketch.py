"""Distinct-count sketching: KMV (k-minimum-values).

The brief's "novel sketch" slot.  Spark's built-in
``approx_count_distinct`` is HLL++ whose register layout is not
reproducible in DuckDB, so the contract-checkable sketch here is KMV
(Bar-Yossef et al. 2002): hash every element into [0, 2^60) (the same
md5 fold used across this repo), keep the k smallest DISTINCT hashes
per group, and estimate

    D̂ = (k − 1) · 2^60 / h_(k)        (h_(k) = k-th smallest hash)

falling back to the exact distinct count when a group has fewer than k
distinct values.  Fully deterministic — integer hashes, one double
division — so the DuckDB oracle matches bit-for-bit after 6dp
rounding.

Scale shape: ONE groupBy per stage — distinct (group, hash) pairs are
partially aggregated map-side, the k-smallest cut is a bounded window
(rank ≤ k), and sketches of partitions/shards MERGE by unioning hash
sets and re-cutting at k (the property that makes KMV a distributed
sketch; asserted in tests)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

HASH_SPACE = float(1 << 60)
DEFAULT_K = 32


def _hash60(col: str) -> F.Column:
    return F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """(group, n_exact, kmv_estimate): KMV estimate next to the exact
    distinct count (n_exact doubles as the oracle-checkable error
    reference; a production pipeline would drop it)."""
    hashed = df.select(
        F.col(group_col).alias("grp"), _hash60(value_col).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("grp").agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("hk").isNotNull(),
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk").cast("double"),
    ).otherwise(F.col("n_exact").cast("double"))
    return stats.select(
        F.col("grp").alias(group_col),
        "n_exact",
        F.round(est, 6).alias("kmv_estimate"),
    )


def kmv_merge_equivalence(
    df: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> bool:
    """Sketch-merge property check (used by tests): computing KMV over
    the union of per-partition k-minima equals KMV over the raw data —
    because the global k smallest hashes are contained in the union of
    per-partition k smallest."""
    direct = {
        r[group_col]: r["kmv_estimate"]
        for r in kmv_distinct(df, group_col, value_col, k).collect()
    }
    hashed = df.select(
        F.col(group_col).alias("grp"),
        _hash60(value_col).alias("h"),
        F.spark_partition_id().alias("pid"),
    ).distinct()
    w = Window.partitionBy("grp", "pid").orderBy("h")
    partial = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("grp", "h")
        .distinct()
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    ranked = partial.withColumn("rn", F.row_number().over(w2))
    # exact count is NOT mergeable from truncated partials — only the
    # estimate is; compare estimates (with the <k fallback recomputed
    # from the true distinct count)
    stats = ranked.groupBy("grp").agg(
        F.count("*").alias("n_partial"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .distinct()
        .groupBy("grp")
        .agg(F.count("*").alias("n_exact"))
    )
    est = F.when(
        F.col("hk").isNotNull(),
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk").cast("double"),
    ).otherwise(F.col("n_exact").cast("double"))
    merged = {
        r["grp"]: r["est"]
        for r in stats.join(exact, "grp").select(
            "grp", F.round(est, 6).alias("est")
        ).collect()
    }
    return direct == merged
