"""Pages source: determinism across parallelism, byte-identical
extraction, end-to-end pages → index → rank-identical search."""

from __future__ import annotations

import duckdb
import pytest

from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query.search import SearchEngine
from lean_explore_spark.sources import pages as P


def test_rows_deterministic_across_partitioning(spark):
    a = P.generate_pages(spark, 300, seed=42, partitions=1).orderBy("url").collect()
    b = P.generate_pages(spark, 300, seed=42, partitions=7).orderBy("url").collect()
    assert a == b
    # different seed differs
    c = P.generate_pages(spark, 300, seed=43, partitions=7).orderBy("url").collect()
    assert a != c


def test_extraction_byte_identical(spark):
    df = P.extract_text(P.generate_pages(spark, 400, partitions=4))
    bad = df.where("extracted_text <> text").count()
    assert bad == 0
    # html is real bytes wrapping the text
    row = df.limit(1).collect()[0]
    assert bytes(row["html"]).startswith(b"<html>")
    assert row["extracted_text"] == row["text"]


def test_schema_and_langs(spark):
    df = P.generate_pages(spark, 200, partitions=2)
    assert [f.name for f in df.schema.fields] == [
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
    ]
    langs = {r["lang"] for r in df.select("lang").distinct().collect()}
    assert langs <= {"en", "de", "fr", "zh"}
    assert "en" in langs


def test_doc_ids_dense_rank_over_url(spark):
    df = P.assign_doc_ids(
        P.generate_pages(spark, 100, partitions=3), method="dense"
    )
    rows = df.select("url", "doc_id").orderBy("url").collect()
    assert [r["doc_id"] for r in rows] == list(range(100))


def test_doc_ids_hash_default(spark):
    """Default hash ids: pure function of url (identical across
    partitionings — no window, no global sort), collision-validated,
    inside [0, 2^62)."""
    a = {
        r["url"]: r["doc_id"]
        for r in P.assign_doc_ids(
            P.generate_pages(spark, 500, partitions=1)
        ).collect()
    }
    b = {
        r["url"]: r["doc_id"]
        for r in P.assign_doc_ids(
            P.generate_pages(spark, 500, partitions=16)
        ).collect()
    }
    assert a == b
    assert len(set(a.values())) == 500
    assert all(0 <= v < 1 << 62 for v in a.values())


def test_doc_ids_hash_plan_is_narrow(spark):
    """The hash path must not shuffle: no Exchange/Window in the plan
    (validate=False isolates the id assignment itself)."""
    df = P.assign_doc_ids(
        P.generate_pages(spark, 10, partitions=2), validate=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan


def test_pages_to_index_rank_identical(spark, tmp_path):
    n = 600
    pages = P.assign_doc_ids(
        P.extract_text(P.generate_pages(spark, n, partitions=4))
    )
    docs = pages.select("doc_id", pages["extracted_text"].alias("text"))
    out = tmp_path / "pages_idx"
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=4).build(
        docs, resume=False
    )
    engine = SearchEngine(spark, str(out), preload=True)

    rows = sorted(
        docs.collect(), key=lambda r: r["doc_id"]
    )
    stats = oracle.build_stats(
        [r["doc_id"] for r in rows], (tokenize_stem(r["text"]) for r in rows)
    )
    for q in [
        "the data page",
        "searchPage index_id query42",
        "über naïve café",
        "theorem definition group ring",
        "compress encode block term",
    ]:
        toks = tokenize_stem(q)
        got = engine.search_tokens(toks, 20)
        want = [(d, s) for d, s in oracle.top_k(stats, toks, 20)]
        assert got == want, f"query {q!r}"
