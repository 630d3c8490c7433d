"""Hybrid score normalization + linear combine (reference full path).

Exact reimplementation of the reference's candidate-set min-max
normalization and weighted combine (src/lean_explore/local/search.py:
687-777; EPSILON=1e-9 at :71; default weights semantic 1.0 /
PageRank 0.2 / BM25 1.0 at defaults.py:107-109), including every
degenerate-range rule:

* semantic: degenerate range → 0.5 baseline, then 1.0 if a single
  candidate with sim > EPS, 0.0 if all sims ≈ 0; clamp [0, 1];
* PageRank / BM25: degenerate range → 1.0 if max > EPS else 0.0.

Provided both as a pure function (oracle + driver-side use on the
final top-k, which is tiny) and as a DataFrame transform (window
min-max over the candidate set) for set-at-a-time pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

EPSILON = 1e-9
DEFAULT_W_SEMANTIC = 1.0
DEFAULT_W_PAGERANK = 0.2
DEFAULT_W_BM25 = 1.0


@dataclass
class HybridScore:
    final_score: float
    norm_similarity: float
    norm_pagerank: float
    norm_bm25: float


def _norm_primary(values: Sequence[float], x: float) -> float:
    """Semantic-similarity normalization incl. the reference's special
    single-candidate and all-zero rules (search.py:721-736)."""
    if not values:
        return 0.0
    lo, hi = min(values), max(values)
    rng = hi - lo
    norm = 0.5
    if rng > EPSILON:
        norm = (x - lo) / rng
    elif len(values) == 1 and values[0] > EPSILON:
        norm = 1.0
    elif rng <= EPSILON and hi <= EPSILON:
        norm = 0.0
    return max(0.0, min(1.0, norm))


def _norm_secondary(values: Sequence[float], x: float) -> float:
    """PageRank / BM25 normalization (search.py:739-753)."""
    if not values:
        return 0.0
    lo, hi = min(values), max(values)
    rng = hi - lo
    norm = 0.0
    if rng > EPSILON:
        norm = (x - lo) / rng
    elif hi > EPSILON:
        norm = 1.0
    return max(0.0, min(1.0, norm))


def combine(
    sims: Sequence[float],
    pageranks: Sequence[float],
    bm25s: Sequence[float],
    w_semantic: float = DEFAULT_W_SEMANTIC,
    w_pagerank: float = DEFAULT_W_PAGERANK,
    w_bm25: float = DEFAULT_W_BM25,
) -> List[HybridScore]:
    """Normalize three parallel signal lists over the candidate set and
    linearly combine — order matches the input candidate order."""
    out: List[HybridScore] = []
    for sim, pr, bm in zip(sims, pageranks, bm25s):
        ns = _norm_primary(sims, sim)
        np_ = _norm_secondary(pageranks, pr)
        nb = _norm_secondary(bm25s, bm)
        out.append(
            HybridScore(
                final_score=w_semantic * ns + w_pagerank * np_ + w_bm25 * nb,
                norm_similarity=ns,
                norm_pagerank=np_,
                norm_bm25=nb,
            )
        )
    return out


def combine_df(
    candidates: DataFrame,
    sim_col: str = "sim",
    pr_col: str = "pagerank",
    bm25_col: str = "bm25",
    w_semantic: float = DEFAULT_W_SEMANTIC,
    w_pagerank: float = DEFAULT_W_PAGERANK,
    w_bm25: float = DEFAULT_W_BM25,
) -> DataFrame:
    """Set-at-a-time variant: global-window min/max (the candidate set
    IS the relation), same degenerate rules, adds ``final_score``.

    The single-candidate semantic rule needs the set size — computed in
    the same window pass (count over ()).
    """
    from pyspark.sql import Window

    w = Window.partitionBy()
    cnt = F.count("*").over(w)

    def rng(c):
        return F.max(c).over(w) - F.min(c).over(w)

    def norm_primary(c):
        lo, hi = F.min(c).over(w), F.max(c).over(w)
        r = hi - lo
        base = (
            F.when(r > EPSILON, (F.col(c) - lo) / r)
            .when((cnt == 1) & (F.col(c) > EPSILON), F.lit(1.0))
            .when((r <= EPSILON) & (hi <= EPSILON), F.lit(0.0))
            .otherwise(F.lit(0.5))
        )
        return F.greatest(F.lit(0.0), F.least(F.lit(1.0), base))

    def norm_secondary(c):
        lo, hi = F.min(c).over(w), F.max(c).over(w)
        r = hi - lo
        base = F.when(r > EPSILON, (F.col(c) - lo) / r).otherwise(
            F.when(hi > EPSILON, F.lit(1.0)).otherwise(F.lit(0.0))
        )
        return F.greatest(F.lit(0.0), F.least(F.lit(1.0), base))

    ns = norm_primary(sim_col)
    np_ = norm_secondary(pr_col)
    nb = norm_secondary(bm25_col)
    return candidates.select(
        "*",
        ns.alias("norm_similarity"),
        np_.alias("norm_pagerank"),
        nb.alias("norm_bm25"),
        (
            F.lit(w_semantic) * ns
            + F.lit(w_pagerank) * np_
            + F.lit(w_bm25) * nb
        ).alias("final_score"),
    )
