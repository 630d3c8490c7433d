"""Similarity-operator semantics: exact blocked-GEMM near-dup vs a
numpy brute-force oracle, tiling invariance, and MEASURED recall of the
multi-table LSH prefilter (ADVICE r1: approximations must be verified
against the exact semantic, never baked into it)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lean_explore_spark.operators import similarity as S

DIM = 64


def _emb_df(spark, mat: np.ndarray):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _exact_pairs(mat: np.ndarray, threshold: float) -> dict:
    m = mat.astype(np.float64)
    dots = m @ m.T
    n = np.sqrt((m * m).sum(axis=1))
    cos = dots / np.outer(n, n)
    out = {}
    for a in range(len(m)):
        for b in range(a + 1, len(m)):
            if cos[a, b] >= threshold:
                out[(a, b)] = round(float(cos[a, b]), 6)
    return out


@pytest.fixture(scope="module")
def corpus():
    """300 float32 base vectors + 40 planted near-dups (cos ≳ 0.95)."""
    rng = np.random.Generator(np.random.Philox(key=[7, 7]))
    base = rng.normal(size=(300, DIM))
    dups = base[:40] + 0.15 * rng.normal(size=(40, DIM))
    return np.vstack([base, dups]).astype(np.float32)


def test_near_dup_exact_matches_numpy(spark, corpus):
    df = _emb_df(spark, corpus)
    got = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in S.embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    # the Spark side consumes float32 arrays cast to float64 — mirror
    want = _exact_pairs(corpus.astype(np.float64), 0.9)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)
    assert len(want) >= 40  # every planted dup found


def test_near_dup_tiling_invariance(spark, corpus):
    """Identical pairs regardless of GEMM tile size (64 → 9 tiles)."""
    df = _emb_df(spark, corpus)
    big = sorted(
        map(tuple, S.embedding_near_dup_pairs(df, 0.9, block_size=1024).collect())
    )
    small = sorted(
        map(tuple, S.embedding_near_dup_pairs(df, 0.9, block_size=64).collect())
    )
    assert big == small


def test_lsh_prefilter_recall_and_precision(spark, corpus):
    """Multi-table OR prefilter: theory says capture probability
    1-(1-p^r)^b with p = 1 - θ/π; for cos 0.9 (p≈0.856), r=8, b=16
    that is ≈0.995.  Assert measured recall ≥ 0.9 and exactness of
    every emitted pair (the rerank filter is exact, so precision = 1)."""
    df = _emb_df(spark, corpus)
    exact = _exact_pairs(corpus.astype(np.float64), 0.9)
    approx = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in S.embedding_near_dup_pairs(
            df, 0.9, lsh_prefilter=True, n_tables=16, n_planes=8
        ).collect()
    }
    assert set(approx) <= set(exact)  # no false positives
    recall = len(approx) / len(exact)
    assert recall >= 0.9, f"measured recall {recall:.3f}"
    for k, v in approx.items():
        assert v == pytest.approx(exact[k], abs=2e-6)


def test_lsh_capture_probability_math():
    """The docstring formula, kept honest: p for cos=0.9 and the
    resulting capture probability for the default prefilter config."""
    p = 1 - math.acos(0.9) / math.pi
    capture = 1 - (1 - p**8) ** 16
    assert 0.85 < p < 0.87
    assert capture > 0.99


def test_ann_multiprobe_widens_candidates(spark, corpus):
    """n_tables > 1 is the multi-probe analog: candidate sets are
    supersets, so the top-k fills where a single bucket starves it,
    and every returned cos equals the exact value."""
    df = _emb_df(spark, corpus)
    one = S.ann_topk_lsh(df, query_vec_id=5, k=20, n_tables=1).collect()
    many = S.ann_topk_lsh(df, query_vec_id=5, k=20, n_tables=8).collect()
    assert len(many) >= len(one)
    exact = {
        r["vec_id"]: r["cos"]
        for r in S.cosine_topk(df, query_vec_id=5, k=340).collect()
    }
    for r in many:
        assert r["cos"] == pytest.approx(exact[r["vec_id"]], abs=1e-9)
    # the planted dup of vector 5 (id 305) shares nearly every plane
    # sign — the multiprobe search must surface it
    assert any(r["vec_id"] == 305 for r in many)


def test_lsh_buckets_deterministic_across_partitionings(spark, corpus):
    """Integer-quantized plane dots: bucket ids are a pure function of
    the vector — identical under any repartitioning (ADVICE r1: float
    sign flakiness)."""
    df = _emb_df(spark, corpus)
    b1 = dict(
        (r["vec_id"], r["bucket"])
        for r in S.rp_lsh_buckets(df.repartition(1)).collect()
    )
    b8 = dict(
        (r["vec_id"], r["bucket"])
        for r in S.rp_lsh_buckets(df.repartition(8)).collect()
    )
    assert b1 == b8
