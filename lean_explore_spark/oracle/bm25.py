"""In-repo BM25Plus oracle (numpy), the rank-identity specification.

Reproduces ``rank_bm25.BM25Plus`` (pip ``rank-bm25>=0.2.2``; Lv & Zhai
2011 "Lower-Bounding Term Frequency Normalization") exactly as the
reference invokes it with library defaults k1=1.5, b=0.75, delta=1
(reference: src/lean_explore/local/search.py:674-678,
pyproject.toml:38; formula pinned in SURVEY.md §2.9):

    df(t)    = number of docs containing t
    idf(t)   = ln(N + 1) - ln(df(t))        (terms absent from the
                                             corpus contribute 0)
    avgdl    = sum(|d|) / N
    score(q, d) = sum over q's tokens WITH MULTIPLICITY of
        idf(t) * (delta + tf(t,d)*(k1+1) /
                          (k1*(1 - b + b*|d|/avgdl) + tf(t,d)))

Key consequences the engine must honor (SURVEY.md §2.9):

* delta-floor: every doc receives idf(t)*delta for every query term
  present anywhere in the corpus, even with tf=0 — a per-query additive
  constant, rank-neutral, but required for score-identity;
* repeated query tokens contribute repeatedly;
* accumulation is float64, query-term-major (the ``for q in query``
  loop in rank_bm25), which this oracle and the engine's scorer both
  follow so float sums agree bit-for-bit;
* negative final scores are clamped to 0.0 by the reference
  (search.py:676-678) — exposed here as ``clamp`` for the full path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

K1 = 1.5
B = 0.75
DELTA = 1.0


@dataclass
class Bm25Stats:
    """Corpus statistics sufficient to score any query."""

    n_docs: int
    avgdl: float
    doc_len: np.ndarray  # int64[n_docs], token counts
    doc_ids: np.ndarray  # int64[n_docs]
    # term -> (df, {row -> tf}) ; row = position in doc_ids/doc_len
    postings: Dict[str, Dict[int, int]] = field(default_factory=dict)

    def idf(self, term: str) -> float:
        tf_map = self.postings.get(term)
        if not tf_map:
            return 0.0
        return math.log(self.n_docs + 1) - math.log(len(tf_map))


def build_stats(
    doc_ids: Sequence[int], tokenized_docs: Iterable[List[str]]
) -> Bm25Stats:
    """Index a tokenized corpus the way BM25Plus.__init__ does."""
    postings: Dict[str, Dict[int, int]] = {}
    doc_len: List[int] = []
    for row, tokens in enumerate(tokenized_docs):
        doc_len.append(len(tokens))
        freqs: Dict[str, int] = {}
        for t in tokens:
            freqs[t] = freqs.get(t, 0) + 1
        for t, tf in freqs.items():
            postings.setdefault(t, {})[row] = tf
    n = len(doc_len)
    dl = np.asarray(doc_len, dtype=np.int64)
    avgdl = float(dl.sum()) / n if n else 0.0
    return Bm25Stats(
        n_docs=n,
        avgdl=avgdl,
        doc_len=dl,
        doc_ids=np.asarray(list(doc_ids), dtype=np.int64),
        postings=postings,
    )


def get_scores(
    stats: Bm25Stats,
    query_tokens: Sequence[str],
    k1: float = K1,
    b: float = B,
    delta: float = DELTA,
    clamp: bool = False,
) -> np.ndarray:
    """Vectorized translation of BM25Plus.get_scores, float64.

    Accumulates query-term-major (outer loop over query tokens, in
    order, with multiplicity) so the float64 sum order matches
    rank_bm25 and the engine's scorer exactly.
    """
    n = stats.n_docs
    score = np.zeros(n, dtype=np.float64)
    if n == 0:
        return score
    if stats.avgdl > 0.0:
        dl_norm = k1 * (
            1.0 - b + b * stats.doc_len.astype(np.float64) / stats.avgdl
        )
    else:
        # Degenerate corpus: every doc has 0 tokens, so the length-norm
        # term is exactly 0 (postings are empty too, so scores stay 0).
        # Computing 0/0 here would emit a RuntimeWarning that masks
        # real NaN regressions in the property suite.
        dl_norm = np.full(n, k1 * (1.0 - b), dtype=np.float64)
    for q in query_tokens:
        tf_map = stats.postings.get(q)
        if not tf_map:
            continue  # idf 0 -> no contribution at all
        idf = math.log(n + 1) - math.log(len(tf_map))
        q_freq = np.zeros(n, dtype=np.float64)
        rows = np.fromiter(tf_map.keys(), dtype=np.int64, count=len(tf_map))
        tfs = np.fromiter(tf_map.values(), dtype=np.float64, count=len(tf_map))
        q_freq[rows] = tfs
        score += idf * (delta + (q_freq * (k1 + 1.0)) / (dl_norm + q_freq))
    if clamp:
        np.maximum(score, 0.0, out=score)
    return score


def top_k(
    stats: Bm25Stats,
    query_tokens: Sequence[str],
    k: int,
    k1: float = K1,
    b: float = B,
    delta: float = DELTA,
) -> List[Tuple[int, float]]:
    """Top-k (doc_id, score), ties broken by doc_id asc.

    The reference relies on Python's stable sort over set-iteration
    order (search.py:777) which is not deterministic; the engine and
    this oracle both pin (score desc, doc_id asc) — SURVEY.md §2.9.
    """
    scores = get_scores(stats, query_tokens, k1=k1, b=b, delta=delta)
    order = np.lexsort((stats.doc_ids, -scores))
    out: List[Tuple[int, float]] = []
    for idx in order[:k]:
        out.append((int(stats.doc_ids[idx]), float(scores[idx])))
    return out
