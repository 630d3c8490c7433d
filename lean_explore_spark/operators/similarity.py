"""Similarity search over embedding columns (``array<float>``).

The reference's FAISS stage (scripts/build_faiss_index.py:183-213,
local/search.py:391-429) maps to three Spark-first paths:

* ``cosine_topk`` — brute-force exact top-k: the embeddings scan stays
  columnar, the dot product is a JVM higher-order-function fold
  (``aggregate``/``zip_with``) in float64 — no Python, no shuffle
  except the final top-k (``orderBy().limit()`` = TakeOrdered, partial
  top-k per partition then a driver merge of k·P rows).
* ``rp_lsh_buckets`` / ``rp_lsh_tables`` — the candidate-pruning path:
  random-hyperplane LSH signs bucket vectors so candidate generation
  touches matching buckets instead of the full corpus (the IVF
  analog).  Multiple independent tables (OR-of-bands) recover the
  recall a single signature loses — capture probability for a pair at
  angle θ is 1 - (1 - p^r)^b with p = 1 - θ/π, r planes per table, b
  tables (measured in tests/test_skew_and_pathology.py).  The plane
  dot is exact INTEGER arithmetic (embedding components quantized by
  floor(x·512)) so the bucket bit can never flip on a float
  summation-order ulp across engines/partitionings.
* ``embedding_near_dup_pairs`` — exact all-pairs cosine ≥ threshold.
  The default execution is a blocked matrix-multiply (vectors packed
  into ~``block_size``-row tiles, tile pairs GEMM'd with numpy inside
  ``mapInPandas``): exact semantics, O(N²/block²) tasks, each a dense
  float64 GEMM instead of an interpreted per-pair fold.
  ``lsh_prefilter=True`` is the at-scale approximation — candidates
  from multi-table LSH, then exact rerank — whose recall is measured,
  documented, and NOT baked into any oracle.

At 10^12 rows brute force is a full scan per query — rp_lsh tables
(or an IVF centroid table) prune the scan to matching buckets via
partition-pruned joins.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

N_PLANES = 8
N_TABLES = 8
# quantization scale for LSH plane dots: floor(x * QUANT) makes the
# dot an exact integer sum — identical in Spark, DuckDB, and numpy
# regardless of accumulation order (ADVICE r1: float sign flakiness)
QUANT = 512


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


def _plane_coeff(p: int, table: int) -> str:
    """SQL expr for the integer coefficient of plane ``p`` of ``table``
    at dimension ``d`` (free variable): a deterministic pseudo-random
    family in [-8, 8], expressible identically in Spark and DuckDB."""
    return f"(({p} * 131 + d * 31 + {table} * 277) % 17 - 8)"


def _bucket_expr(n_planes: int, table: int) -> str:
    """Bucket = Σ_p (plane-dot > 0) << p with the plane dot an exact
    integer: Σ_d floor(x_d · QUANT) · coeff(p, d)."""
    bit = (
        "cast(aggregate(zip_with(embedding,"
        " sequence(0, size(embedding) - 1),"
        f" (x, d) -> cast(floor(cast(x as double) * {QUANT}.0d) as bigint)"
        f" * {_plane_coeff('{p}', table)}),"
        " cast(0 as bigint), (acc, v) -> acc + v) > 0 as int)"
    )
    return " + ".join(
        f"({bit.format(p=p)} * {1 << p})" for p in range(n_planes)
    )


def rp_lsh_buckets(
    embeddings: DataFrame, n_planes: int = N_PLANES, table: int = 0
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane LSH bucket per vector for
    one hash table.  coeff(p, d) = (p·131 + d·31 + table·277) % 17 − 8;
    bucket = Σ_p (Σ_d floor(x_d·512)·coeff > 0) << p.  Integer dots:
    bit-reproducible across engines and accumulation orders."""
    return embeddings.select(
        "vec_id",
        F.expr(_bucket_expr(n_planes, table)).cast("long").alias("bucket"),
    )


def lsh_bucket_of(
    vec: np.ndarray, n_planes: int = N_PLANES, table: int = 0
) -> int:
    """numpy twin of the bucket expression, for OUT-OF-CORPUS query
    vectors (the hybrid service embeds queries driver-side): exact
    integer arithmetic → guaranteed to match the Spark/SQL buckets."""
    vq = np.floor(np.asarray(vec, dtype=np.float64) * QUANT).astype(np.int64)
    d = np.arange(len(vq), dtype=np.int64)
    bucket = 0
    for p in range(n_planes):
        coeff = (p * 131 + d * 31 + table * 277) % 17 - 8
        if int((vq * coeff).sum()) > 0:
            bucket |= 1 << p
    return bucket


def rp_lsh_tables(
    embeddings: DataFrame,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """(vec_id, table, bucket): ``n_tables`` independent LSH tables in
    ONE pass over the embeddings (stack expression — no self-union, the
    scan is read once)."""
    pairs = ", ".join(
        f"{t}, cast(({_bucket_expr(n_planes, t)}) as bigint)"
        for t in range(n_tables)
    )
    return embeddings.select(
        "vec_id",
        F.expr(f"stack({n_tables}, {pairs})").alias("table", "bucket"),
    )


# ---------------------------------------------------------------------
# exact all-pairs near-dup: blocked GEMM
# ---------------------------------------------------------------------

_BLOCK_SCHEMA = "blk long, n int, ids binary, mat binary"


def _pack_blocks(embeddings: DataFrame, block_size: int) -> DataFrame:
    """Pack vectors into ~block_size-row tiles keyed by vec_id range:
    (blk, n, ids: int64 bytes, mat: float64 row-major bytes).  One
    shuffle of the embeddings, tile payloads stay executor-side."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        return pd.DataFrame(
            {
                "blk": [int(pdf["blk"].iloc[0])],
                "n": [len(ids)],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
            }
        )

    withb = embeddings.select(
        "vec_id",
        "embedding",
        F.floor(F.col("vec_id") / block_size).cast("long").alias("blk"),
    )
    return withb.groupBy("blk").applyInPandas(pack, schema=_BLOCK_SCHEMA)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    lsh_prefilter: bool = False,
    block_size: int = 1024,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos) with
    vec_a < vec_b and cosine ≥ threshold, cos rounded 6dp.

    Default = EXACT: tile pairs of packed blocks are cross-joined
    (blk_a ≤ blk_b) and each tile pair is one numpy GEMM — exact
    ``cos = dot / (‖a‖·‖b‖)`` semantics over every pair, with
    O((N/block)²) tasks instead of an N² row join.  The N² work is
    inherent to the exact semantic; at 10^12 rows you run the
    ``lsh_prefilter=True`` variant: candidates = pairs sharing ANY of
    ``n_tables`` LSH buckets, then exact rerank.  Its recall is
    1-(1-p^r)^b per pair (p = 1 - θ/π) — measured in
    tests/test_skew_and_pathology.py, NOT assumed by any oracle.
    """
    if lsh_prefilter:
        tb = rp_lsh_tables(embeddings, n_tables, n_planes)
        a = tb.select(
            F.col("vec_id").alias("vec_a"), "table",
            F.col("bucket").alias("ba"),
        )
        b = tb.select(
            F.col("vec_id").alias("vec_b"), "table",
            F.col("bucket").alias("bb"),
        )
        cand = (
            a.join(b, ["table"])
            .where(
                (F.col("ba") == F.col("bb"))
                & (F.col("vec_a") < F.col("vec_b"))
            )
            .select("vec_a", "vec_b")
            .distinct()
        )
        ea = embeddings.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
        )
        eb = embeddings.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
        )
        pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
        cos = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
        return (
            pairs.select("vec_a", "vec_b", cos.alias("_c"))
            .where(F.col("_c") >= threshold)
            .select("vec_a", "vec_b", F.round("_c", 6).alias("cos"))
        )

    packed = _pack_blocks(embeddings, block_size)
    a = packed.select(
        F.col("blk").alias("blk_a"), F.col("n").alias("n_a"),
        F.col("ids").alias("ids_a"), F.col("mat").alias("mat_a"),
    )
    b = packed.select(
        F.col("blk").alias("blk_b"), F.col("n").alias("n_b"),
        F.col("ids").alias("ids_b"), F.col("mat").alias("mat_b"),
    )
    tile_pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    thr = float(threshold)

    def gemm(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            va: List[np.ndarray] = []
            vb: List[np.ndarray] = []
            vc: List[np.ndarray] = []
            for row in pdf.itertuples(index=False):
                ids_a = np.frombuffer(row.ids_a, dtype=np.int64)
                ids_b = np.frombuffer(row.ids_b, dtype=np.int64)
                A = np.frombuffer(row.mat_a, dtype=np.float64).reshape(
                    int(row.n_a), -1
                )
                B = np.frombuffer(row.mat_b, dtype=np.float64).reshape(
                    int(row.n_b), -1
                )
                dots = A @ B.T
                na = np.sqrt((A * A).sum(axis=1))
                nb = np.sqrt((B * B).sum(axis=1))
                cos = dots / np.outer(na, nb)
                mask = (cos >= thr) & (ids_a[:, None] < ids_b[None, :])
                ia, ib = np.nonzero(mask)
                if ia.size:
                    va.append(ids_a[ia])
                    vb.append(ids_b[ib])
                    vc.append(np.round(cos[ia, ib], 6))
            if va:
                yield pd.DataFrame(
                    {
                        "vec_a": np.concatenate(va),
                        "vec_b": np.concatenate(vb),
                        "cos": np.concatenate(vc),
                    }
                )

    return tile_pairs.mapInPandas(
        gemm, schema="vec_a long, vec_b long, cos double"
    )


# ---------------------------------------------------------------------
# IVF — the FAISS analog with trained centroids (coarse quantizer)
# ---------------------------------------------------------------------


def _kmeans(sample: np.ndarray, nlist: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (FAISS also
    trains its coarse quantizer on a sample, build_faiss_index.py:183-
    213 nlist=100).  GEMM-based distances; empty clusters keep their
    previous centroid."""
    rng = np.random.Generator(np.random.Philox(key=[seed, nlist]))
    cent = sample[rng.choice(len(sample), size=nlist, replace=False)].copy()
    for _ in range(iters):
        d = -2.0 * (sample @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_build(
    embeddings: DataFrame,
    nlist: int = 16,
    sample_size: int = 10_000,
    iters: int = 20,
    seed: int = 7,
):
    """Train an IVF coarse quantizer and assign every vector to its
    nearest centroid (reference: scripts/build_faiss_index.py:183-213,
    IVF nlist=100 trained on the corpus).

    Returns (centroids: float64 [nlist, dim] — unit-normalized space,
    assigned: DataFrame (vec_id, list_id)).  Training is a driver-side
    sample (deterministic: lowest vec_ids); assignment is one
    Arrow-batched narrow map over the full table with the centroids in
    the closure — at 10^12 rows the assignment is the only full pass,
    and ``list_id`` becomes the partition key the probes prune on.
    """
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample_size)
        .collect()
    )
    sample = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    nlist = min(nlist, len(sample))
    centroids = _kmeans(sample, nlist, iters, seed)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            mat = _np.array(list(pdf["embedding"]), dtype=_np.float64)
            mat = mat / _np.linalg.norm(mat, axis=1, keepdims=True)
            d = -2.0 * (mat @ centroids.T) + (
                centroids * centroids
            ).sum(axis=1)[None, :]
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "list_id": d.argmin(axis=1).astype(_np.int32),
                }
            )

    assigned = embeddings.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, list_id int"
    )
    return centroids, assigned


def ivf_topk(
    embeddings: DataFrame,
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: np.ndarray,
    k: int = 20,
    nprobe: int = 4,
) -> DataFrame:
    """IVF query: probe the ``nprobe`` nearest inverted lists
    (reference defaults.py:99-103 nprobe=200), exact cosine rerank of
    their members.  ``nprobe == nlist`` degenerates to the exact scan
    (asserted in tests); candidates are monotone in nprobe."""
    q = np.asarray(query_vec, dtype=np.float64)
    qunit = q / np.linalg.norm(q)
    d = -2.0 * (centroids @ qunit) + (centroids * centroids).sum(axis=1)
    probes = [int(i) for i in np.argsort(d)[:nprobe]]
    cand = assigned.where(F.col("list_id").isin(probes)).select("vec_id")

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            mat = _np.array(list(pdf["embedding"]), dtype=_np.float64)
            norms = _np.linalg.norm(mat, axis=1)
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cos": (mat @ qunit) / norms,
                }
            )

    scored = (
        embeddings.join(cand, "vec_id")
        .mapInPandas(score, "vec_id long, cos double")
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    n_planes: int = N_PLANES,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to vectors sharing
    the query's bucket in ANY of ``n_tables`` LSH tables.  One table
    reproduces the reference's single-probe IVF shape; more tables are
    the multi-probe/oversampling analog (defaults.py:99-103 nprobe=200,
    oversample ×3): candidate recall grows as 1-(1-p^r)^b, so
    under-filled buckets stop starving k."""
    tb = rp_lsh_tables(embeddings, n_tables, n_planes)
    qb = tb.where(F.col("vec_id") == query_vec_id).select(
        "table", F.col("bucket").alias("qbucket")
    )
    cand = (
        tb.join(F.broadcast(qb), "table")
        .where(F.col("bucket") == F.col("qbucket"))
        .select("vec_id")
        .distinct()
    )
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        embeddings.join(cand, "vec_id")
        .where(F.col("vec_id") != query_vec_id)
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
