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


def test_distributed_regime_keeps_edges_cached(spark, monkeypatch):
    """ADVICE r4 (medium): the edges cache must survive round 1's
    snapshot-unpersist hygiene.  The cached RDD only registers in
    getPersistentRDDs on its first job; materializing edges BEFORE the
    base snapshot puts it in base_ids so the per-round snapshot-diff
    never unpersists it.  (The failure is a per-round shuffle re-read,
    not a source rescan — shuffle-file reuse masks it from
    accumulator-based detection, measured while writing this test.)

    Differential: with the fix, ≥1 new persistent RDD (the edges
    cache) exists at the FIRST in-function snapshot, stays present in
    every later snapshot, and is never passed to _unpersist_rdds;
    without the fix the first snapshot contains no new id."""
    sc = spark.sparkContext
    before = D._persistent_rdd_ids(sc)

    snaps, dropped = [], []
    orig_snap, orig_unp = D._persistent_rdd_ids, D._unpersist_rdds

    def rec_snap(sc_):
        s = orig_snap(sc_)
        snaps.append(set(s))
        return s

    def rec_unp(sc_, ids):
        dropped.append(set(ids))
        orig_unp(sc_, ids)

    monkeypatch.setattr(D, "_persistent_rdd_ids", rec_snap)
    monkeypatch.setattr(D, "_unpersist_rdds", rec_unp)

    pairs = _pairs(spark, [(10, 11), (11, 12), (12, 13), (13, 14), (20, 21)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dup_clusters(pairs, driver_threshold=0).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 20: 20, 21: 20}

    edges_ids = snaps[0] - before
    assert edges_ids, "edges cache not materialized before base snapshot"
    for s in snaps[1:]:
        assert edges_ids <= s  # cached through every round
    for d in dropped:
        assert not (edges_ids & d)  # hygiene never drops the edges cache


# --- novel_docs: incremental dedup against an existing corpus (r7) ---

BASE_A = ("the quick brown fox jumps over the lazy dog while rain "
          "falls softly on the quiet village roofs tonight")
BASE_B = ("completely different content about database engines and "
          "vectorized execution plans with columnar storage formats")


def test_novel_docs_crafted(spark):
    from lean_explore_spark.operators.dedup import novel_docs

    old = spark.createDataFrame(
        [(1, BASE_A), (2, BASE_B)], "doc_id long, text string"
    )
    rev_a = " ".join(reversed(BASE_A.lower().split()))
    new = spark.createDataFrame(
        [
            (100, BASE_A),                    # exact copy -> dropped
            (101, BASE_A + " zz qq ww"),      # near-dup -> dropped
            (102, rev_a),                     # reversed: shingles differ
            (103, "entirely fresh text about gardening tips and soil"),
            (104, "hi"),                      # too short for a shingle
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in novel_docs(new, old).select("doc_id").collect()
    )
    assert kept == [102, 103, 104]
    # original columns ride through the anti-join
    assert novel_docs(new, old).columns == ["doc_id", "text"]


def test_novel_docs_refine_off_is_conservative(spark):
    from lean_explore_spark.operators.dedup import novel_docs

    old = spark.createDataFrame([(1, BASE_A)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, BASE_A), (103, "entirely fresh text about gardening")],
        "doc_id long, text string",
    )
    with_refine = {
        r["doc_id"] for r in novel_docs(new, old).collect()
    }
    without = {
        r["doc_id"] for r in novel_docs(new, old, refine=False).collect()
    }
    assert without <= with_refine  # LSH-only can only drop MORE
    assert 103 in without and 100 not in with_refine


def test_novel_docs_matches_python_jaccard(spark):
    """Refined decision == pure-Python: drop iff some old doc shares
    an LSH band AND exact shingle-jaccard >= 0.5."""
    import hashlib
    import random
    import re

    from lean_explore_spark.operators import dedup as D
    from lean_explore_spark.operators.dedup import novel_docs

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25)))
    old_rows = [(i, mk()) for i in range(20)]
    new_rows = [(100 + i, mk()) for i in range(20)] + [
        (200 + i, t) for i, (_, t) in enumerate(old_rows[:5])  # copies
    ]

    def sh3(text):
        toks = re.findall(r"\w+", text.lower())
        return {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        }

    def x60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % D.MERSENNE31

    def bands(text):
        shs = sh3(text)
        if not shs:
            return set()
        xs = [x60(s) for s in shs]
        sig = [
            min((a * x + b) % D.MERSENNE31 for x in xs)
            for _, a, b in D.HASH_PARAMS
        ]
        return {
            (bi, tuple(sig[bi * D.BAND_ROWS:(bi + 1) * D.BAND_ROWS]))
            for bi in range(len(sig) // D.BAND_ROWS)
        }

    expected_novel = []
    for nid, nt in new_rows:
        dropped = False
        for _, ot in old_rows:
            if bands(nt) & bands(ot):
                a, b = sh3(nt), sh3(ot)
                if a and b and len(a & b) / len(a | b) >= 0.5:
                    dropped = True
                    break
        if not dropped:
            expected_novel.append(nid)

    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in novel_docs(new, old).collect())
    assert got == sorted(expected_novel)
