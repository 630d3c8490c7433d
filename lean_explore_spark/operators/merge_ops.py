"""Snapshot merge / upsert operators (reference J7/J8/J9, SURVEY §2.3).

The reference carries human-written descriptions across corpus
versions by intersecting composite content keys and merging row-by-row
(scripts/merge_db.py:104-139), and re-syncs snapshots by upsert +
stale-delete (phase1_tasks.py:195-265, :649+).  Declarative Spark:
one broadcast-or-shuffle equi-join on the content key + coalesce for
the carry-over, a left-anti join for stale detection — both of which
Iceberg's MERGE INTO executes as a single snapshot commit at
production scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def content_key(col: str = "text") -> F.Column:
    """Composite content key: LF-normalized sha256 (reference
    merge_db.py keys on text_hash + docstring + source_file; the
    content hash is the load-bearing part — phase3_tasks.py:160-173)."""
    return F.sha2(F.regexp_replace(F.col(col), "\r\n", "\n"), 256)


def carry_over(
    curr: DataFrame, prev: DataFrame, carry_cols: list[str]
) -> DataFrame:
    """Carry columns from a previous snapshot onto the current one by
    content key; unmatched rows keep NULL (J7)."""
    # min() per key, not dropDuplicates: duplicate contents must carry
    # a DETERMINISTIC value (first-writer-wins analog, phase3:425-441)
    prev_sel = (
        prev.select(content_key().alias("_k"), *carry_cols)
        .groupBy("_k")
        .agg(*[F.min(c).alias(f"_prev_{c}") for c in carry_cols])
    )
    joined = curr.withColumn("_k", content_key()).join(prev_sel, "_k", "left")
    out = joined.select(
        *[c for c in curr.columns],
        *[F.col(f"_prev_{c}").alias(c) for c in carry_cols],
    )
    return out


def stale_rows(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Rows present in the existing snapshot but absent from the
    incoming one (the reference's stale-delete set, J8)."""
    return existing.join(incoming.select(key), key, "left_anti")
