"""Similarity search over embedding columns (``array<float>``).

The reference's FAISS stage (scripts/build_faiss_index.py:183-213,
local/search.py:391-429) maps to two Spark-first paths:

* ``cosine_topk`` — brute-force exact top-k: the embeddings scan stays
  columnar, the dot product is a JVM higher-order-function fold
  (``aggregate``/``zip_with``) in float64 — no Python, no shuffle
  except the final top-k (``orderBy().limit()`` = TakeOrdered, partial
  top-k per partition then a driver merge of k·P rows).
* ``rp_lsh_buckets`` — the scale path: random-hyperplane LSH signs
  bucket vectors so candidate generation touches one bucket instead of
  the full corpus (the IVF analog).  Hyperplane components are a pure
  integer formula of (plane, dim), so the same buckets come out of the
  SQL oracle.

At 10^12 rows brute force is a full scan per query — rp_lsh_buckets
(or an IVF centroid table) prunes the scan to matching buckets via
partition-pruned joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

N_PLANES = 8


def _dot(a: str, b: str) -> F.Column:
    """Float64 dot product of two float-array columns (JVM fold)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " cast(x as double) * cast(y as double)), cast(0.0 as double),"
        " (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.expr(
        f"sqrt(aggregate({a}, cast(0.0 as double),"
        " (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 20
) -> DataFrame:
    """Exact brute-force cosine top-k vs the vector of ``query_vec_id``.

    Output (vec_id, cos) rounded 6dp, excluding the query vector,
    ties broken by vec_id asc.
    """
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                _dot("embedding", "qvec")
                / (_norm("embedding") * _norm("qvec"))
            ).alias("_cos"),
        )
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def rp_lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): random-hyperplane LSH bucket per vector.

    plane(p, d) = ((p*131 + d*31) % 17 - 8) / 8.0 — a deterministic
    pseudo-random hyperplane family expressible in both engines.
    bucket = Σ_p (dot(v, plane_p) > 0) << p.
    """
    bit = (
        "cast(aggregate(zip_with(embedding,"
        " transform(sequence(0, size(embedding) - 1),"
        f" d -> (({{p}} * 131 + d * 31) % 17 - 8) / 8.0d),"
        " (x, h) -> cast(x as double) * h), cast(0.0 as double),"
        " (acc, v) -> acc + v) > 0.0 as int)"
    )
    expr = " + ".join(
        f"({bit.format(p=p)} * {1 << p})" for p in range(n_planes)
    )
    return embeddings.select(
        "vec_id", F.expr(expr).cast("long").alias("bucket")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    lsh_prefilter: bool = True,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos) with
    vec_a < vec_b and cosine ≥ threshold, cos rounded 6dp.

    With ``lsh_prefilter`` (the scale path, default) candidates come
    from rp_lsh_buckets equality — the pair join is per-bucket instead
    of quadratic over the corpus (near-dup vectors almost always share
    all hyperplane signs).  ``lsh_prefilter=False`` is the exact
    exhaustive form for small sets / recall audits.
    """
    if lsh_prefilter:
        with_b = embeddings.join(rp_lsh_buckets(embeddings, n_planes), "vec_id")
        a = with_b.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("ea"),
            F.col("bucket").alias("ba"),
        )
        b = with_b.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("eb"),
            F.col("bucket").alias("bb"),
        )
        pairs = a.join(
            b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b"))
        )
    else:
        a = embeddings.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
        )
        b = embeddings.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
        )
        pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("_c"))
        .where(F.col("_c") >= threshold)
        .select("vec_a", "vec_b", F.round("_c", 6).alias("cos"))
    )


def ann_topk_lsh(
    embeddings: DataFrame, query_vec_id: int, k: int = 20,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: brute-force cosine restricted to the query's
    LSH bucket (falls back to fewer than k when the bucket is small —
    the standard multi-probe extension widens buckets at scale)."""
    buckets = rp_lsh_buckets(embeddings, n_planes)
    with_b = embeddings.join(buckets, "vec_id")
    qb = buckets.where(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    cand = with_b.crossJoin(F.broadcast(qb)).where(
        F.col("bucket") == F.col("qbucket")
    )
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        cand.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                _dot("embedding", "qvec")
                / (_norm("embedding") * _norm("qvec"))
            ).alias("_cos"),
        )
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
