"""Near-dup clustering (connected components over pair edges) and
canonical-corpus selection — the post-pair stage of a web-scale dedup
pipeline."""

from __future__ import annotations

import pytest

from lean_explore_spark.operators import dedup as D


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_chain_propagates_to_global_min(spark):
    # path graph 10-11-12-13-14: diameter > 1 forces multiple rounds
    pairs = _pairs(spark, [(10, 11), (11, 12), (12, 13), (13, 14)])
    got = {
        r["doc_id"]: r["cluster_id"] for r in D.dup_clusters(pairs).collect()
    }
    assert got == {i: 10 for i in range(10, 15)}


def test_disjoint_components_and_unordered_edges(spark):
    pairs = _pairs(
        spark, [(5, 3), (3, 9), (20, 25), (100, 40), (40, 41), (25, 21)]
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in D.dup_clusters(pairs).collect()
    }
    assert got == {
        3: 3, 5: 3, 9: 3,
        20: 20, 25: 20, 21: 20,
        40: 40, 41: 40, 100: 40,
    }


def test_determinism_across_partitionings(spark):
    import random

    rnd = random.Random(7)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    p1 = _pairs(spark, edges)
    p2 = _pairs(spark, edges).repartition(13)
    g1 = sorted(map(tuple, D.dup_clusters(p1).collect()))
    g2 = sorted(map(tuple, D.dup_clusters(p2).collect()))
    assert g1 == g2
    # cluster_id is always the component min: no label exceeds member
    assert all(c <= d for d, c in g1)


def test_canonicalize_keeps_representatives_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"] for r in D.canonicalize(docs, pairs).collect()
    )
    # losers: 2,3 (cluster 1) and 6 (cluster 5)
    assert kept == [0, 1, 4, 5, 7]


def test_contract_query_matches_recursive_oracle(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import SF_ORACLE
    from tests.test_driver_contract import _compare

    spark_pdf = E.queries()["dedup_clusters"](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(E.oracle_sql()["dedup_clusters"]).fetchdf()
    assert len(spark_pdf) > 0
    _compare(spark_pdf, duck_pdf, "dedup_clusters")


def test_driver_and_distributed_regimes_agree(spark):
    import random

    rnd = random.Random(11)
    edges = [(rnd.randrange(80), rnd.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = _pairs(spark, edges)
    drv = sorted(map(tuple, D.dup_clusters(pairs).collect()))
    dist = sorted(
        map(tuple, D.dup_clusters(pairs, driver_threshold=0).collect())
    )
    assert drv == dist


def test_driver_regime_1m_pairs_arrow_fast(spark):
    """r3 VERDICT #3: the driver regime moves pairs via Arrow
    (toPandas) and solves components vectorized (root-hooking +
    pointer jumping) — 1M pairs in seconds, where py4j Row collection
    plus a per-pair Python union-find loop took minutes at the 5M
    threshold."""
    import time

    import numpy as np
    import pandas as pd

    # realistic near-dup shape: 250k clusters of 5 mutually-near docs,
    # star edges hub→spokes → exactly 1M pairs
    hub = np.repeat(np.arange(250_000, dtype=np.int64) * 16, 4)
    spoke = hub + np.tile(np.arange(1, 5, dtype=np.int64), 250_000)

    t0 = time.time()
    nodes, inv = np.unique(np.concatenate([hub, spoke]), return_inverse=True)
    roots = D._components_numpy(
        inv[: len(hub)], inv[len(hub):], len(nodes)
    )
    solve_sec = time.time() - t0
    # every spoke labels to its hub (hub is the component min)
    want = np.repeat(np.arange(250_000, dtype=np.int64) * 16, 5)
    assert np.array_equal(np.sort(nodes[roots]), np.sort(want))
    assert solve_sec < 10, solve_sec  # sub-second on a calm box

    # end-to-end through Spark (Arrow transfer + result createDataFrame)
    pairs = spark.createDataFrame(pd.DataFrame({"doc_a": hub, "doc_b": spoke}))
    t0 = time.time()
    n_losers = (
        D.dup_clusters(pairs).where("doc_id != cluster_id").count()
    )
    e2e_sec = time.time() - t0
    assert n_losers == 1_000_000
    assert e2e_sec < 90, e2e_sec
