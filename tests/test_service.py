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


def test_bm25_signal_is_corpus_exact(service):
    res = service.search("fast table scan merge join", sim_threshold=-1.0, limit=500)
    tokens = service.engine.analyze_query("fast table scan merge join")
    full = dict(service.engine.search_tokens(tokens, service.engine.n_docs))
    for r in res:
        assert r.raw_bm25 == full[r.doc_id]
