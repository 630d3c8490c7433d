"""Property-based rank-identity: random corpora, queries, k, and block
sizes through pack_postings → (WAND | bulk) must match the oracle
bit-for-bit.  Pure Python layer (no Spark) so hypothesis can explore
hundreds of cases cheaply."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lean_explore_spark.index import codec
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query import wand

WORDS = [
    "the", "of", "data", "scan", "merge", "group", "ring", "über", "naïve",
    "x1", "y_2", "block", "term", "zipf",
]

corpus_st = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=30),
    min_size=1,
    max_size=40,
)
query_st = st.lists(st.sampled_from(WORDS + ["missing"]), min_size=0, max_size=6)


def _engine_topk(docs, query_tokens, k, block_size, num_shards, scorer):
    ids = list(range(len(docs)))
    stats = oracle.build_stats(ids, docs)
    span = max(1, math.ceil(len(docs) / num_shards))

    # pack per (term, shard)
    packs: dict = {}
    for term, tfmap in stats.postings.items():
        for row, tf in sorted(tfmap.items()):
            shard = row // span
            packs.setdefault((term, shard), []).append((row, tf))

    dfs = {t: len(m) for t, m in stats.postings.items()}
    live = [t for t in query_tokens if t in dfs]
    uterms, uindex = [], {}
    for t in live:
        if t not in uindex:
            uindex[t] = len(uterms)
            uterms.append(t)
    idfs = np.array(
        [math.log(stats.n_docs + 1) - math.log(dfs[t]) for t in uterms]
    )
    ctx = wand.QueryContext(
        [uindex[t] for t in live], idfs, 1.5, 0.75, 1.0, stats.avgdl
    )
    heap: list = []
    for shard in range(num_shards):
        dl_ids = np.arange(shard * span, min((shard + 1) * span, len(docs)))
        dl_lens = stats.doc_len[dl_ids]
        cursors = []
        for t in uterms:
            lst = packs.get((t, shard))
            if not lst:
                continue
            d = np.array([r for r, _ in lst], dtype=np.int64)
            tf = np.array([f for _, f in lst], dtype=np.int64)
            p = codec.pack_postings(
                d, tf, stats.doc_len[d], avgdl=stats.avgdl,
                block_size=block_size, ranks=np.searchsorted(dl_ids, d),
            )
            cursors.append(wand.TermCursor(p, uindex[t], dl_ids))
        if not cursors:
            continue
        if scorer == "bulk":
            wand.bulk_score_shard(cursors, ctx, dl_ids, dl_lens, heap, k)
        elif scorer == "blockmax":
            wand.blockmax_bulk_shard(cursors, ctx, dl_ids, dl_lens, heap, k)
        else:
            wand.wand_shard(cursors, ctx, dl_ids, dl_lens, heap, k)
    matched = {e[2] for e in heap}
    return wand.finalize_topk(
        heap, ctx, k, (d for d in ids if d not in matched)
    )


@given(
    corpus_st,
    query_st,
    st.integers(min_value=1, max_value=50),
    st.sampled_from([4, 16, 128]),
    st.integers(min_value=1, max_value=5),
    st.sampled_from(["wand", "bulk", "blockmax"]),
)
@settings(max_examples=150, deadline=None)
def test_random_corpus_rank_identity(
    docs, query, k, block_size, num_shards, scorer
):
    got = _engine_topk(docs, query, k, block_size, num_shards, scorer)
    want = [
        (d, s)
        for d, s in oracle.top_k(
            oracle.build_stats(range(len(docs)), docs), query, k
        )
    ]
    assert got == want
