"""Offline ranking-agreement analysis over a gather_results dump —
the LLM-free analog of the reference's ranking study
(``benchmarking/analyze_rankings.py:16-283``, which scores engines
with an LLM judge; without a judge in this environment the rigorous
substitute is agreement metrics between engines, with the WAND path —
bit-exact vs the oracle — as the baseline).

Per engine pair and per query it computes, then averages:

* ``exact``    — full top-k identity (ids AND order)
* ``overlap``  — |A∩B| / k (set agreement at k)
* ``tau``      — Kendall tau-a over the shared ids' relative order
* ``rbo``      — rank-biased overlap (p=0.9), weighting early ranks

Usage:
    python jobs/gather_results.py --out /tmp/results.jsonl ...
    python jobs/analyze_rankings.py --in /tmp/results.jsonl \
        [--baseline wand]
prints one JSON line {"baseline": ..., "pairs": {...}, "queries": N}.
"""

from __future__ import annotations

import argparse
import json
from itertools import combinations
from pathlib import Path


def kendall_tau(a: list[int], b: list[int]) -> float:
    """Tau-a over the ids present in BOTH rankings (relative order);
    1.0 for identical order, -1.0 for reversed, 0.0 if <2 shared."""
    shared = [x for x in a if x in set(b)]
    if len(shared) < 2:
        return 0.0
    pos_b = {x: i for i, x in enumerate(b)}
    n_pairs = 0
    concordant = 0
    for i, j in combinations(range(len(shared)), 2):
        n_pairs += 1
        if pos_b[shared[i]] < pos_b[shared[j]]:
            concordant += 1
    return (2.0 * concordant - n_pairs) / n_pairs


def rbo(a: list[int], b: list[int], p: float = 0.9) -> float:
    """Rank-biased overlap (Webber et al. 2010), truncated form:
    RBO@d = (1-p) Σ_{i=1..d} p^(i-1) · |A_i ∩ B_i| / i, normalized by
    the same sum with perfect agreement."""
    depth = min(len(a), len(b))
    if depth == 0:
        return 1.0
    sa: set = set()
    sb: set = set()
    num = 0.0
    den = 0.0
    inter = 0
    seen_both: set = set()
    for i in range(depth):
        sa.add(a[i])
        sb.add(b[i])
        # incremental intersection size
        if a[i] in sb:
            seen_both.add(a[i])
        if b[i] != a[i] and b[i] in sa:
            seen_both.add(b[i])
        inter = len(seen_both)
        w = p**i
        num += w * inter / (i + 1)
        den += w
    return num / den


def analyze(lines: list[dict], baseline: str = "wand") -> dict:
    by_query: dict = {}
    for ln in lines:
        by_query.setdefault(ln["query"], {})[ln["engine"]] = [
            r["doc_id"] for r in ln["results"]
        ]
    engines = sorted({ln["engine"] for ln in lines})
    pairs: dict = {}
    for e in engines:
        if e == baseline:
            continue
        stats = {"exact": 0.0, "overlap": 0.0, "tau": 0.0, "rbo": 0.0}
        n = 0
        for q, ranks in by_query.items():
            if baseline not in ranks or e not in ranks:
                continue
            a, b = ranks[baseline], ranks[e]
            n += 1
            stats["exact"] += 1.0 if a == b else 0.0
            k = max(len(a), len(b)) or 1
            stats["overlap"] += len(set(a) & set(b)) / k
            stats["tau"] += kendall_tau(a, b)
            stats["rbo"] += rbo(a, b)
        pairs[f"{baseline}-vs-{e}"] = {
            m: round(v / n, 4) if n else None for m, v in stats.items()
        }
    return {
        "baseline": baseline,
        "engines": engines,
        "queries": len(by_query),
        "pairs": pairs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--baseline", default="wand")
    args = ap.parse_args()
    lines = [
        json.loads(s)
        for s in Path(args.inp).read_text().splitlines()
        if s.strip()
    ]
    print(json.dumps(analyze(lines, args.baseline)))


if __name__ == "__main__":
    main()
