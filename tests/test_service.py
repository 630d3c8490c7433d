"""Hybrid SearchService: pipeline-stage behavior mirroring the
reference's service tests (threshold, filters, empty query, ordering —
tests/lean_explore/local/test_search.py:497-824 shapes)."""

from __future__ import annotations

import numpy as np
import pytest

from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.query import hybrid
from lean_explore_spark.query.service import SearchService
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("svc") / "idx"
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=4).build(
        docs, resume=False
    )
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    pr = {i: (i % 10) / 10.0 for i in range(500)}
    return SearchService(
        spark, str(out), emb, doc_meta=docs, pagerank=pr
    )


def test_empty_query_early_return(service):
    assert service.search("") == []
    assert service.search("   ") == []


def test_threshold_prunes(service):
    everything = service.search("fast table scan", sim_threshold=-1.0, limit=500)
    thresholded = service.search("fast table scan", sim_threshold=0.525, limit=500)
    assert len(thresholded) <= len(everything)
    assert all(r.raw_similarity >= 0.525 for r in thresholded)


def test_lang_filter(service):
    res = service.search("fast table scan", lang_filter=["de"], sim_threshold=-1.0)
    assert res, "expected german candidates with no threshold"
    assert all(service._lang[r.doc_id] == "de" for r in res)


def test_ordering_and_combination(service):
    res = service.search("fast table scan merge join", sim_threshold=-1.0)
    assert res
    scores = [r.final_score for r in res]
    assert scores == sorted(scores, reverse=True)
    # recompute the hybrid combine over the same candidate signals
    sims = [r.raw_similarity for r in res]
    prs = [r.pagerank for r in res]
    bms = [r.raw_bm25 for r in res]
    again = hybrid.combine(sims, prs, bms)
    # candidate-set here is the truncated result set, so only verify
    # per-row weighted identity instead: final = 1.0*ns + 0.2*np + 1.0*nb
    for r in res:
        assert r.final_score == pytest.approx(
            1.0 * r.norm_similarity + 0.2 * r.norm_pagerank + 1.0 * r.norm_bm25,
            rel=1e-12,
        )
    # determinism
    res2 = service.search("fast table scan merge join", sim_threshold=-1.0)
    assert [(r.doc_id, r.final_score) for r in res] == [
        (r.doc_id, r.final_score) for r in res2
    ]


def test_driver_mode_parity(service, spark, tmp_path_factory):
    """embedding_mode='driver' (preloaded matrix) returns the same
    results as the default spark mode (per-query table scan)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    drv = SearchService(
        spark, str(service.engine.root), emb, doc_meta=docs,
        pagerank=service.pagerank, embedding_mode="driver",
    )
    for q in ("fast table scan", "merge join index"):
        a = service.search(q, sim_threshold=-1.0)
        b = drv.search(q, sim_threshold=-1.0)
        # BLAS dgemv on the full matrix vs per-batch dots differ in the
        # last ulp — the two modes are equivalent generators, not
        # bit-twins: same candidate set, scores equal to 1e-9
        am = {r.doc_id: r for r in a}
        bm = {r.doc_id: r for r in b}
        assert set(am) == set(bm)
        for d in am:
            assert am[d].final_score == pytest.approx(
                bm[d].final_score, abs=1e-9
            )
            assert am[d].raw_bm25 == bm[d].raw_bm25  # exact: same engine


def test_ann_pruned_candidates(service, spark):
    """ann_tables>0 prunes the embedding scan to the query's LSH
    buckets: every returned candidate must also appear in the exact
    scan with an identical similarity (subset property — the ANN path
    never fabricates scores)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    ann = SearchService(
        spark, str(service.engine.root), emb,
        pagerank=service.pagerank, ann_tables=8,
    )
    qvec = ann.embed("fast table scan")
    exact = dict(service._candidates_spark(qvec, 500))
    pruned = ann._candidates_spark(qvec, 500)
    assert pruned, "ANN path returned no candidates"
    assert len(pruned) <= len(exact)
    for d, s in pruned:
        assert s == pytest.approx(exact[d], abs=1e-12)


def test_bm25_signal_is_corpus_exact(service):
    res = service.search("fast table scan merge join", sim_threshold=-1.0, limit=500)
    tokens = service.engine.analyze_query("fast table scan merge join")
    full = dict(service.engine.search_tokens(tokens, service.engine.n_docs))
    for r in res:
        assert r.raw_bm25 == full[r.doc_id]


def test_cold_mode_parity(service, spark):
    """preload=False (r2 VERDICT #3): every asset access is a pruned
    Spark read; results must be bit-identical to the preloaded service
    and nothing corpus-sized may land in the engine caches."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    cold = SearchService(
        spark, str(service.engine.root), emb, doc_meta=docs,
        pagerank=service.pagerank, preload=False,
    )
    assert cold.engine._dict_cache is None
    assert cold.engine._postings_cache is None
    for q in ("fast table scan", "merge join index"):
        a = service.search(q, sim_threshold=-1.0)
        b = cold.search(q, sim_threshold=-1.0)
        assert [(r.doc_id, r.final_score, r.raw_bm25) for r in a] == [
            (r.doc_id, r.final_score, r.raw_bm25) for r in b
        ]
    # cold mode never filled the preload caches
    assert cold.engine._dict_cache is None
    assert cold.engine._postings_cache is None


def test_lexical_search_distributed_parity(service):
    """service.lexical_search routes through per-shard Spark WAND
    tasks when distributed=True and must be bit-identical to the
    driver-side engine path."""
    for q in ("fast table scan merge join", "customer orders data"):
        local = service.lexical_search(q, k=25)
        dist = service.lexical_search(q, k=25, distributed=True)
        routed = service.lexical_search(q, k=25, routed=True)
        assert local == dist == routed
        assert len(local) == 25


def test_batch_search_matches_single(service):
    qs = ["fast table scan", "merge join index", ""]
    batch = service.batch_search(qs, sim_threshold=-1.0)
    assert len(batch) == 3
    for q, got in zip(qs, batch):
        want = service.search(q, sim_threshold=-1.0)
        assert [(r.doc_id, r.final_score) for r in got] == [
            (r.doc_id, r.final_score) for r in want
        ]


def test_lang_cache_is_lru_bounded(spark, tmp_path_factory):
    """r4 VERDICT #3: a long-running spark-mode service must not grow
    the doc_id→lang map without bound.  With a tiny cache the map
    holds ≤ max(bound, current batch) entries across many queries, and
    the lang filter still works on the query being served."""
    from lean_explore_spark.query.service import SearchService

    out = tmp_path_factory.mktemp("svc_lru") / "idx"
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=2, num_buckets=4).build(
        docs, resume=False
    )
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    svc = SearchService(
        spark, str(out), emb, doc_meta=docs, lang_cache_size=50
    )
    queries = ["fast table scan", "customer orders", "data page merge",
               "compress encode", "theorem group"]
    for q in queries:
        res = svc.search(q, lang_filter=["de"], sim_threshold=-1.0)
        assert all(svc._lang[r.doc_id] == "de" for r in res)
        # bound = max(50, last batch) — batch is faiss_k*3 candidates
        assert len(svc._lang) <= max(50, 300)
    # unbounded behavior would have ~5 batches × up-to-300 ids
    assert len(svc._lang) <= 300


def test_batch_lexical_search_matches_single(service):
    qs = ["fast table scan", "customer orders data", "", "zzz absent"]
    singles = [service.lexical_search(q, 10) for q in qs]
    assert service.batch_lexical_search(qs, 10) == singles
    assert service.batch_lexical_search(qs, 10, distributed=True) == singles


def test_batch_search_distributed_bit_identical(service):
    """r5 VERDICT #1: the batched spark-mode sweep (candidates + lang
    lookup for ALL queries in ~2 jobs) must be BIT-identical to the
    per-query path — every field, not just ranks, because the batched
    kernel computes the same per-query matvec and the remaining
    stages are the shared _finish code."""
    qs = ["fast table scan", "merge join index", "", "customer orders data"]
    for kw in ({"sim_threshold": -1.0}, {}):
        batch = service.batch_search(qs, distributed=True, **kw)
        assert len(batch) == len(qs)
        for q, got in zip(qs, batch):
            want = service.search(q, **kw)
            assert [
                (r.doc_id, r.final_score, r.raw_similarity, r.raw_bm25,
                 r.norm_similarity, r.norm_pagerank, r.norm_bm25)
                for r in got
            ] == [
                (r.doc_id, r.final_score, r.raw_similarity, r.raw_bm25,
                 r.norm_similarity, r.norm_pagerank, r.norm_bm25)
                for r in want
            ], q


def test_batch_search_distributed_lang_filter_and_ann(service, spark):
    """Batched sweep under ann_tables pruning + lang filter: same
    oversampling, same probe buckets, same filter — bit-identical to
    per-query calls on the same service."""
    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    ann = SearchService(
        spark, str(service.engine.root), emb, doc_meta=docs,
        pagerank=service.pagerank, ann_tables=8,
    )
    qs = ["fast table scan", "theorem group data"]
    batch = ann.batch_search(
        qs, sim_threshold=-1.0, lang_filter=["de"], distributed=True
    )
    for q, got in zip(qs, batch):
        want = ann.search(q, sim_threshold=-1.0, lang_filter=["de"])
        assert [(r.doc_id, r.final_score, r.raw_similarity) for r in got] == [
            (r.doc_id, r.final_score, r.raw_similarity) for r in want
        ], q
    # plain lang-filtered batch on the exact-scan service too
    batch2 = service.batch_search(
        qs, sim_threshold=-1.0, lang_filter=["de"], distributed=True
    )
    for q, got in zip(qs, batch2):
        want = service.search(q, sim_threshold=-1.0, lang_filter=["de"])
        assert [(r.doc_id, r.final_score) for r in got] == [
            (r.doc_id, r.final_score) for r in want
        ], q


def test_batch_search_distributed_job_count(service, spark):
    """The point of the batched path: Spark-job count is O(1) in the
    number of queries (candidates + lang lookup), not O(Q).  8 queries
    per-query-mode schedule ~16 jobs; the batch must stay well under."""
    qs = [
        "fast table scan", "merge join index", "customer orders data",
        "compress encode block", "theorem definition group",
        "data page merge", "hash join probe", "sort spill partition",
    ]
    sc = spark.sparkContext
    sc.setJobGroup("hybrid_batch_jobs", "batched hybrid sweep")
    try:
        out = service.batch_search(qs, sim_threshold=-1.0, distributed=True)
    finally:
        sc.setJobGroup("", "")
    assert all(len(r) > 0 for r in out)
    jobs = sc.statusTracker().getJobIdsForGroup("hybrid_batch_jobs")
    # measured: 2 jobs (window top-k + lang broadcast-semi); bound
    # leaves AQE headroom while staying far below the ~16 per-query
    # jobs that would mark a regression to O(Q) scheduling
    assert 0 < len(jobs) <= 6, len(jobs)


def test_ann_tables_pinned_once(service, spark):
    """r6 regression guard: the LSH bucket tables are built and
    persisted at service init (ANN index load) — NOT re-derived from
    the raw embeddings per query.  Pre-fix, every probe recomputed 8
    tables of corpus plane-dots: 21.9 s/query at 400k vs 1.50 s
    pinned (bench_raw/serving_hybrid_r6_400k.json).  Guard both the
    pinning and the per-query job bound."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    ann = SearchService(
        spark, str(service.engine.root), emb,
        pagerank=service.pagerank, ann_tables=8,
    )
    assert ann._lsh_tables.is_cached, "LSH tables must be persisted"
    qvec = ann.embed("fast table scan")
    ann._candidates_spark(qvec, 50)  # warm
    sc = spark.sparkContext
    sc.setJobGroup("ann_per_query", "pinned ANN probe")
    try:
        ann._candidates_spark(qvec, 50)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("ann_per_query")
    # measured: 2 (probe join + top-k); 4 allows scheduler jitter but
    # catches the rebuild (which adds the table-derivation job chain)
    assert 0 < len(jobs) <= 4, len(jobs)
