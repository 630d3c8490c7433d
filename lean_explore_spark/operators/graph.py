"""Graph operators: PageRank as an iterative DataFrame job.

Rebuild of the reference's PageRank pass (scripts/pagerank.py:76-291:
``nx.pagerank(G, alpha=0.85, max_iter=1000, tol=1e-8)`` over the
dependency graph, then log + min-max scaling :420-443).  Spark-first:
the rank vector is a DataFrame joined per iteration against a
pre-partitioned edge list; convergence is an L1-norm aggregate, same
tolerance semantics as networkx (sum |Δ| < n·tol).

Scale notes: edges are repartitioned by src once and reused every
iteration (one shuffle per iteration for the rank join, partial-agg
on dst); ranks are checkpointed via localCheckpoint every few
iterations to cut lineage growth.  Dangling-node mass is redistributed
uniformly, matching networkx exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

ALPHA = 0.85
TOL = 1e-8
MAX_ITER = 1000


def pagerank(
    edges: DataFrame,
    alpha: float = ALPHA,
    tol: float = TOL,
    max_iter: int = MAX_ITER,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(src, dst) edge list → (node, rank).

    Nodes = all endpoint ids; duplicate edges collapse (the reference
    builds a simple DiGraph: repeated dependency rows are one edge).
    """
    spark = edges.sparkSession
    raw = edges.select("src", "dst")

    # FULL-driver regime (r9): when the DISTINCT edge list itself fits
    # the driver (≤ ~30M rows ≈ hundreds of MB via Arrow), ONE shuffle
    # (the distinct) + ONE Arrow transfer replace everything — node
    # set, out-degrees, dangling set and every iteration are numpy
    # (np.unique / bincount / gather).  The per-iteration regime below
    # still pays one broadcast build + one shuffled aggregation + one
    # toPandas PER ITERATION (12 Spark jobs for the contract query;
    # measured ~26 s at sf1.0 where the edge transfer is ~2 s).  Same
    # float64 formula; summation-order differences vs groupBy(dst).sum
    # are absorbed by the contract's 8dp rounding exactly as the
    # Spark-vs-DuckDB orders already are.
    m = raw.count()  # RAW count (≥ distinct): a cheap, conservative gate
    if m == 0:
        return raw.select(
            F.col("src").alias("node"), F.lit(0.0).alias("rank")
        )
    if m <= 30_000_000:
        return _pagerank_driver_full(spark, raw, alpha, tol, max_iter)

    edges = raw.distinct().cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    base = (1.0 - alpha) / n

    # edge contribution weights, repartitioned once and reused
    weighted = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition("src")
        .cache()
    )
    weighted.count()
    # the dangling SET is fixed across iterations — materialize once;
    # only its rank mass changes per iteration
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).cache()
    dangling_nodes.count()

    # rank/contrib relations are O(nodes) — for graphs whose node set
    # fits the driver (≤ ~5M, the same bound that makes the broadcast
    # legal) the rank VECTOR lives driver-side between iterations: it
    # was being broadcast each iteration anyway, so collecting the new
    # vector back is the same O(n) transfer, and every iteration gets a
    # CONSTANT-SIZE plan — no lineage growth, no checkpoints at all
    # (r2 BENCH regression: eager localCheckpoint every 3 iterations
    # was 4 driver-blocking materializations per 12-iter run, 41 s;
    # non-eager was worse — each broadcast recomputed the whole
    # untruncated chain).  Beyond 5M nodes the shuffled-join path below
    # keeps everything distributed (edges stay partitioned by src).
    if n <= 5_000_000:
        return _pagerank_driver_ranks(
            spark, weighted, nodes, dangling_nodes, n, alpha, base,
            tol, max_iter,
        )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    hint = lambda df: df  # noqa: E731 - shuffled join path

    for it in range(max_iter):
        contribs = (
            weighted.join(hint(ranks), weighted.src == ranks.node)
            .select("dst", (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass (ranks of nodes with no out-edges) stays IN the
        # plan as a broadcast one-row aggregate — no per-iteration
        # driver action; the eager checkpoint below is the only job
        dang = (
            ranks.join(hint(dangling_nodes), "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        new_ranks = (
            nodes.join(hint(contribs), nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            # EAGER: the per-iteration rank broadcast recomputes from
            # the last materialized plan — a lazy cut would recompute
            # the whole window per broadcast (measured 3× worse)
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol > 0:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < n * tol:
                break
        else:
            # tol=0 pins an exact iteration count (contract determinism)
            # and saves the per-iteration convergence action
            ranks = new_ranks
    return ranks


def _pagerank_driver_full(
    spark,
    edges: DataFrame,
    alpha: float,
    tol: float,
    max_iter: int,
) -> DataFrame:
    """PageRank with BOTH the rank vector and the edge list
    driver-resident (distinct edges ≤ ~30M).  One Arrow transfer of
    (src, dst) up front; the node set, out-degrees, edge weights and
    dangling set come from np.unique/bincount, and every iteration is
    a numpy gather + bincount scatter-add — no per-iteration Spark
    jobs at all (the regimes below keep the edges distributed when
    they don't fit)."""
    import numpy as np
    import pandas as pd

    e = edges.toPandas()
    s_raw = e["src"].to_numpy(dtype=np.int64)
    d_raw = e["dst"].to_numpy(dtype=np.int64)
    # duplicate edges collapse (reference: simple DiGraph) — numpy
    # lexsort+mask instead of a Spark distinct shuffle
    order = np.lexsort((d_raw, s_raw))
    s_raw, d_raw = s_raw[order], d_raw[order]
    keep = np.r_[True,
                 (s_raw[1:] != s_raw[:-1]) | (d_raw[1:] != d_raw[:-1])]
    s_raw, d_raw = s_raw[keep], d_raw[keep]
    node_ids, inv = np.unique(np.concatenate([s_raw, d_raw]),
                              return_inverse=True)
    src, dst = inv[: len(s_raw)], inv[len(s_raw):]
    n = len(node_ids)
    base = (1.0 - alpha) / n
    deg = np.bincount(src, minlength=n)
    w = 1.0 / deg[src]
    dang_idx = np.flatnonzero(deg == 0)
    ranks = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_iter):
        in_sum = np.bincount(dst, weights=w * ranks[src], minlength=n)
        dm = float(np.sum(ranks[dang_idx])) if len(dang_idx) else 0.0
        new_ranks = base + alpha * (in_sum + dm / float(n))
        delta = float(np.abs(new_ranks - ranks).sum())
        ranks = new_ranks
        if tol > 0 and delta < n * tol:
            break
    return spark.createDataFrame(
        pd.DataFrame({"node": node_ids, "rank": ranks})
    )


def _pagerank_driver_ranks(
    spark,
    weighted: DataFrame,
    nodes: DataFrame,
    dangling_nodes: DataFrame,
    n: int,
    alpha: float,
    base: float,
    tol: float,
    max_iter: int,
) -> DataFrame:
    """PageRank with a driver-resident rank vector (n ≤ ~5M).

    Spark does the O(edges) work — ONE broadcast join + partial-
    aggregated shuffle per iteration over the src-partitioned edge
    cache — while the O(n) rank update is numpy on the driver.  Same
    float64 formula as the distributed path and the unrolled-CTE
    oracle: rank' = base + α·(in_sum + dangling_mass/n)."""
    import numpy as np
    import pandas as pd

    # Arrow both ways (toPandas / createDataFrame-from-pandas): at the
    # 5M-node ceiling the O(n) driver↔cluster transfer is columnar
    # batches, not py4j row objects
    node_ids = np.sort(
        nodes.toPandas()["node"].to_numpy(dtype=np.int64)
    )
    dang_idx = np.searchsorted(
        node_ids,
        np.sort(
            dangling_nodes.toPandas()["node"].to_numpy(dtype=np.int64)
        ),
    )
    ranks = np.full(n, 1.0 / n, dtype=np.float64)

    for _ in range(max_iter):
        rdf = spark.createDataFrame(
            pd.DataFrame({"node": node_ids, "rank": ranks})
        )
        contrib = (
            weighted.join(F.broadcast(rdf), weighted.src == rdf.node)
            .select("dst", (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
            .toPandas()
        )
        in_sum = np.zeros(n, dtype=np.float64)
        if len(contrib):
            pos = np.searchsorted(
                node_ids, contrib["dst"].to_numpy(dtype=np.int64)
            )
            in_sum[pos] = contrib["in_sum"].to_numpy(dtype=np.float64)
        dm = float(np.sum(ranks[dang_idx])) if len(dang_idx) else 0.0
        new_ranks = base + alpha * (in_sum + dm / float(n))
        delta = float(np.abs(new_ranks - ranks).sum())
        ranks = new_ranks
        if tol > 0 and delta < n * tol:
            break

    return spark.createDataFrame(
        pd.DataFrame({"node": node_ids, "rank": ranks})
    )


def scaled_pagerank(ranks: DataFrame) -> DataFrame:
    """log(rank + 1e-9) then min-max to [0,1] (pagerank.py:420-443)."""
    lg = ranks.select("node", F.log(F.col("rank") + F.lit(1e-9)).alias("lr"))
    mm = lg.agg(F.min("lr").alias("lo"), F.max("lr").alias("hi")).collect()[0]
    lo, hi = float(mm["lo"]), float(mm["hi"])
    rng = hi - lo
    if rng <= 0:
        return lg.select("node", F.lit(0.0).alias("scaled_rank"))
    return lg.select(
        "node", ((F.col("lr") - F.lit(lo)) / F.lit(rng)).alias("scaled_rank")
    )


# fold the accumulating level-union into an eager checkpoint every
# this many levels: truncates the O(levels) plan chain and releases
# the window's frontier checkpoints (r4 VERDICT #2)
_OUT_CHECKPOINT_EVERY = 32


def topological_levels(
    edges: DataFrame,
    max_iter: int = 10_000,
    driver_threshold: int = 5_000_000,
) -> DataFrame:
    """Kahn's algorithm (reference G2, scripts/lean_to_english.py:
    272-371: topological processing order with cycle fallback).

    Returns (node, level): level = longest-path depth from any source.
    Nodes left after ``max_iter`` or stuck in cycles get level -1 (the
    reference's cycle fallback processes them last).

    Two regimes (same split as pagerank / dedup.dup_clusters, r3/r4
    lesson: per-round Spark-job scheduling dominates on small graphs —
    the frontier-join loop measured 19.8 s on a 5k-node tree where the
    driver Kahn runs in milliseconds):

    * edge set fits the driver (≤ ``driver_threshold``): ONE Arrow
      transfer + an O(V+E) Kahn pass, exact and deterministic.
    * larger: the distributed frontier-join loop — one left-anti per
      round, eager localCheckpoints for constant-size plans,
      O(longest path) rounds.

    The distributed regime's storage hygiene diffs persistent-RDD-id
    snapshots and assumes a single-threaded driver while it runs (see
    dedup._persistent_rdd_ids): a concurrent job's cache persisted
    between snapshots would be unpersisted (recompute cost, never
    wrongness).
    """
    spark = edges.sparkSession
    probe = (
        edges.select("src", "dst")
        .distinct()
        .limit(driver_threshold + 1)
        .toPandas()
    )
    if len(probe) <= driver_threshold:
        import numpy as np
        import pandas as pd

        if probe.empty:
            return spark.createDataFrame([], "node long, level int")
        a = probe["src"].to_numpy(dtype=np.int64)
        b = probe["dst"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ia, ib = inv[: len(a)], inv[len(a):]
        n = len(nodes)
        indeg = np.bincount(ib, minlength=n)
        order = np.argsort(ia, kind="stable")
        ib_s = ib[order].tolist()
        starts = np.searchsorted(ia[order], np.arange(n + 1)).tolist()
        level = [0] * n
        indeg_l = indeg.tolist()
        queue = [i for i in range(n) if indeg_l[i] == 0]
        qi = 0
        while qi < len(queue):
            u = queue[qi]
            qi += 1
            lu1 = level[u] + 1
            for k in range(starts[u], starts[u + 1]):
                v = ib_s[k]
                if lu1 > level[v]:
                    level[v] = lu1
                indeg_l[v] -= 1
                if indeg_l[v] == 0:
                    queue.append(v)
        # cycle fallback: nodes never reaching indegree 0
        for i in range(n):
            if indeg_l[i] > 0:
                level[i] = -1
        out = pd.DataFrame(
            {"node": nodes, "level": np.array(level, dtype=np.int32)}
        )
        return spark.createDataFrame(out, "node long, level int")

    # Executor-storage hygiene (r4 VERDICT #2 — mirrors the dedup
    # dup_clusters fix): each round's eager localCheckpoints are
    # unpersisted once superseded, and the accumulating `out` union is
    # eagerly checkpointed every _OUT_CHECKPOINT_EVERY levels, which
    # both truncates the O(levels) plan chain and lets the window's
    # frontier checkpoints (still referenced by the union until then)
    # be released.  On return only the blocks the RESULT depends on
    # stay persisted: the last `out` checkpoint, ≤ window frontiers,
    # and the final remaining_nodes snapshot — bounded, not O(levels).
    from lean_explore_spark.operators.dedup import (
        _persistent_rdd_ids,
        _unpersist_rdds,
    )

    sc = spark.sparkContext
    edges = edges.select("src", "dst").distinct().cache()
    # materialize the cache BEFORE the base snapshot so its RDD id
    # lands in base_ids, never in a superseded-round diff (the dedup
    # ADVICE-r4 trap)
    edges.count()
    base_ids = _persistent_rdd_ids(sc)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    remaining_edges = edges
    remaining_nodes = nodes.localCheckpoint(eager=True)
    round_ids = _persistent_rdd_ids(sc) - base_ids
    window_ids: set = set()  # frontier ckpts since the last out ckpt
    out_ids: set = set()
    out: DataFrame | None = None
    level = 0
    while level < max_iter:
        with_in = remaining_edges.select(F.col("dst").alias("node")).distinct()
        pre = _persistent_rdd_ids(sc)
        frontier = remaining_nodes.join(
            with_in, "node", "left_anti"
        ).localCheckpoint(eager=True)
        fids = _persistent_rdd_ids(sc) - pre
        if frontier.isEmpty():
            _unpersist_rdds(sc, fids)
            break  # only cycles remain
        window_ids |= fids
        out_lvl = frontier.withColumn("level", F.lit(level))
        out = out_lvl if out is None else out.unionByName(out_lvl)
        pre = _persistent_rdd_ids(sc)
        remaining_nodes = remaining_nodes.join(
            frontier, "node", "left_anti"
        ).localCheckpoint(eager=True)
        remaining_edges = remaining_edges.join(
            frontier.withColumnRenamed("node", "src"), "src", "left_anti"
        ).localCheckpoint(eager=True)
        new_round = _persistent_rdd_ids(sc) - pre
        # the previous round's remaining_* snapshots back nothing now
        # (frontier and the new snapshots are checkpoint-truncated)
        _unpersist_rdds(sc, round_ids)
        round_ids = new_round
        level += 1
        if level % _OUT_CHECKPOINT_EVERY == 0:
            pre = _persistent_rdd_ids(sc)
            out = out.localCheckpoint(eager=True)
            new_out = _persistent_rdd_ids(sc) - pre
            # the union chain is folded into the new checkpoint; the
            # window's frontiers and the superseded out ckpt release
            _unpersist_rdds(sc, (window_ids | out_ids) - new_out)
            window_ids, out_ids = set(), new_out
        if remaining_nodes.isEmpty():
            break
    edges.unpersist()  # result depends only on checkpointed blocks
    cyclic = remaining_nodes.withColumn("level", F.lit(-1))
    if out is None:
        return cyclic
    return out.unionByName(cyclic)


CONTRACT_PR_ITERS = 12


def supplier_part_pagerank(spark, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: PageRank over the supplier→part graph
    derived from lineitem (bipartite; parts offset to a disjoint id
    space), ranks rounded 8dp.

    Iteration count is PINNED (tol=0 → exactly CONTRACT_PR_ITERS
    iterations) so the DuckDB oracle can unroll the same fixed number
    of iterations as chained CTEs and value-match."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + F.lit(1_000_000)).alias("dst"),
    )
    pr = pagerank(edges, max_iter=CONTRACT_PR_ITERS, tol=0.0)
    return pr.select("node", F.round("rank", 8).alias("rank"))
