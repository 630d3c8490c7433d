"""BM25Plus oracle sanity tests against hand-computed values.

The formula is pinned in SURVEY.md §2.9 from rank_bm25's BM25Plus
(k1=1.5, b=0.75, delta=1, idf = ln(N+1) - ln(df)) as invoked by the
reference (src/lean_explore/local/search.py:674-678).
"""

import math

import numpy as np
import pytest

from lean_explore_spark.oracle.bm25 import build_stats, get_scores, top_k


def _hand_score(tf, dl, avgdl, n, df, k1=1.5, b=0.75, delta=1.0):
    idf = math.log(n + 1) - math.log(df)
    return idf * (delta + (tf * (k1 + 1)) / (k1 * (1 - b + b * dl / avgdl) + tf))


def test_single_term_corpus():
    docs = [["cat", "dog"], ["cat", "cat", "fish"], ["bird"]]
    stats = build_stats([10, 20, 30], docs)
    assert stats.n_docs == 3
    assert stats.avgdl == pytest.approx(6 / 3)
    scores = get_scores(stats, ["cat"])
    exp0 = _hand_score(1, 2, 2.0, 3, 2)
    exp1 = _hand_score(2, 3, 2.0, 3, 2)
    exp2 = _hand_score(0, 1, 2.0, 3, 2)  # delta-floor: idf*delta even at tf=0
    assert scores[0] == pytest.approx(exp0, abs=0, rel=1e-15)
    assert scores[1] == pytest.approx(exp1, abs=0, rel=1e-15)
    assert scores[2] == pytest.approx(exp2, abs=0, rel=1e-15)
    assert exp2 > 0  # every doc gets the additive constant


def test_absent_term_contributes_zero():
    stats = build_stats([1, 2], [["a"], ["b"]])
    scores = get_scores(stats, ["zzz"])
    assert np.all(scores == 0.0)


def test_query_multiplicity_doubles_contribution():
    stats = build_stats([1, 2], [["a", "b"], ["b"]])
    one = get_scores(stats, ["a"])
    two = get_scores(stats, ["a", "a"])
    assert two[0] == pytest.approx(2 * one[0], rel=1e-15)


def test_topk_tie_break_by_docid():
    # identical docs -> identical scores -> docID ascending
    stats = build_stats([7, 3, 5], [["x"], ["x"], ["x"]])
    result = top_k(stats, ["x"], 3)
    assert [d for d, _ in result] == [3, 5, 7]
    assert result[0][1] == result[1][1] == result[2][1]


def test_topk_ordering():
    stats = build_stats(
        [1, 2, 3],
        [["ring", "group"], ["ring", "ring", "ring"], ["field"]],
    )
    result = top_k(stats, ["ring"], 2)
    assert result[0][0] == 2  # highest tf wins
    assert result[0][1] > result[1][1]
