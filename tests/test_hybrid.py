"""Hybrid normalize+combine parity with the reference's own unit test
(tests/lean_explore/local/test_search.py:825-968: sims 0.8/0.7/0.6,
pageranks 0.1/0.8/0.5, bm25 0.8/0.5/0.2, weights 0.6/0.3/1.0 →
final scores 1.6 / 1.1 / 0.17142)."""

import pytest

from lean_explore_spark.query import hybrid

SIMS = [0.8, 0.7, 0.6]
PRS = [0.1, 0.8, 0.5]
BMS = [0.8, 0.5, 0.2]


def test_combine_matches_reference_unit_test():
    out = hybrid.combine(
        SIMS, PRS, BMS, w_semantic=0.6, w_pagerank=0.3, w_bm25=1.0
    )
    assert out[0].final_score == pytest.approx(1.6)
    assert out[0].norm_similarity == pytest.approx(1.0)
    assert out[0].norm_pagerank == pytest.approx(0.0)
    assert out[0].norm_bm25 == pytest.approx(1.0)
    assert out[1].final_score == pytest.approx(1.1)
    assert out[1].norm_similarity == pytest.approx(0.5)
    assert out[1].norm_pagerank == pytest.approx(1.0)
    assert out[2].final_score == pytest.approx(0.17142, abs=1e-4)
    assert out[2].norm_pagerank == pytest.approx(0.57142, abs=1e-4)


def test_degenerate_rules():
    # single candidate with positive sim → 1.0 (search.py:728-731)
    assert hybrid.combine([0.9], [0.0], [0.0])[0].norm_similarity == 1.0
    # all-zero sims → 0.0
    out = hybrid.combine([0.0, 0.0], [0.0, 0.0], [0.0, 0.0])
    assert out[0].norm_similarity == 0.0
    assert out[0].final_score == 0.0
    # equal positive pageranks → 1.0 (secondary degenerate rule)
    out = hybrid.combine([0.1, 0.9], [0.4, 0.4], [0.0, 0.0])
    assert out[0].norm_pagerank == 1.0 and out[1].norm_pagerank == 1.0
    # equal mid-range sims (not near zero) → 0.5 baseline
    out = hybrid.combine([0.5, 0.5], [0.0, 0.1], [0.0, 0.0])
    assert out[0].norm_similarity == 0.5


def test_combine_df_matches_pure(spark):
    rows = [(i, s, p, b) for i, (s, p, b) in enumerate(zip(SIMS, PRS, BMS))]
    df = spark.createDataFrame(
        rows, "id long, sim double, pagerank double, bm25 double"
    )
    got = {
        r["id"]: r
        for r in hybrid.combine_df(
            df, w_semantic=0.6, w_pagerank=0.3, w_bm25=1.0
        ).collect()
    }
    want = hybrid.combine(
        SIMS, PRS, BMS, w_semantic=0.6, w_pagerank=0.3, w_bm25=1.0
    )
    for i, w in enumerate(want):
        assert got[i]["final_score"] == pytest.approx(w.final_score, rel=1e-12)
        assert got[i]["norm_similarity"] == pytest.approx(
            w.norm_similarity, rel=1e-12
        )
        assert got[i]["norm_pagerank"] == pytest.approx(
            w.norm_pagerank, rel=1e-12
        )
    # single-row degenerate rule through the window path too
    one = spark.createDataFrame(
        [(0, 0.9, 0.0, 0.0)], "id long, sim double, pagerank double, bm25 double"
    )
    assert hybrid.combine_df(one).collect()[0]["norm_similarity"] == 1.0
