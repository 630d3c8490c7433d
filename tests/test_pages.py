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


def test_hash128_resolves_forced_collisions(spark, tmp_path):
    """r5 VERDICT #3: method='hash128' deterministically RESOLVES
    62-bit-style collisions instead of raising.  Forced with a tiny
    hash width (bits=12 over 300 urls → collisions certain by the
    birthday bound): ids come out unique, in-range, a pure function of
    the url set (partitioning-independent), and an index built over
    the resolved ids queries rank-identically to the numpy oracle."""
    pages = P.generate_pages(spark, 300, partitions=4)

    # plain hash at the same width would collide and raise
    import pyspark.sql.functions as F

    narrow = pages.withColumn(
        "doc_id", F.expr("shiftrightunsigned(xxhash64(url), 52)")
    )
    n, d = narrow.agg(
        F.count("*"), F.count_distinct("doc_id")
    ).collect()[0]
    assert int(d) < int(n), "bits=12 over 300 urls must collide"

    ids = P.assign_doc_ids(pages, method="hash128", bits=12)
    rows = ids.select("url", "doc_id").collect()
    mapping = {r["url"]: r["doc_id"] for r in rows}
    assert len(set(mapping.values())) == len(rows) == 300  # unique
    assert all(0 <= v < 2**12 for v in mapping.values())

    # deterministic across partitioning / re-runs
    ids2 = P.assign_doc_ids(
        pages.repartition(7), method="hash128", bits=12
    )
    assert {
        r["url"]: r["doc_id"] for r in ids2.select("url", "doc_id").collect()
    } == mapping

    # duplicate urls can never converge → the distinct error fires
    with pytest.raises(ValueError, match="distinct urls"):
        P.assign_doc_ids(
            pages.unionAll(pages.limit(5)),
            method="hash128",
            bits=12,
            max_rounds=3,
        )

    # end-to-end: build + query over the collision-resolved ids
    docs = P.extract_text(ids).select(
        "doc_id", P.F.col("extracted_text").alias("text")
    )
    out = tmp_path / "idx128"
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=4).build(
        docs, resume=False
    )
    eng = SearchEngine(spark, str(out), preload=True)
    drows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    stats = oracle.build_stats(
        [r["doc_id"] for r in drows],
        (tokenize_stem(r["text"]) for r in drows),
    )
    for q in ("the data page", "compress encode block", "zzz absent"):
        toks = tokenize_stem(q)
        assert eng.search_tokens(toks, 10) == [
            (d, s) for d, s in oracle.top_k(stats, toks, 10)
        ], q
