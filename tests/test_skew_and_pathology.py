"""Hot-term skew + pathological-corpus robustness (SURVEY.md §7 risk
register: groupBy-key skew, Zipf distribution; empty/degenerate docs)."""

from __future__ import annotations

import json

import pytest

from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query.search import SearchEngine


@pytest.fixture(scope="module")
def skewed_index(spark, tmp_path_factory):
    # one ultra-hot term in EVERY doc + a Zipf-ish tail; some empty and
    # punctuation-only docs
    rows = []
    for i in range(2000):
        if i % 97 == 0:
            rows.append((i, ""))
        elif i % 89 == 0:
            rows.append((i, "!!! ... ???"))
        else:
            tail = " ".join(f"w{j}" for j in range(i % 7))
            rows.append((i, ("the " * (1 + i % 5)) + tail))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tmp_path_factory.mktemp("skew") / "idx"
    IndexBuilder(spark, str(out), num_shards=8, num_buckets=4).build(
        docs, resume=False
    )
    return str(out), rows


def test_hot_term_groups_bounded_by_span(spark, skewed_index):
    index_dir, _ = skewed_index
    span = json.loads(open(f"{index_dir}/stats.json").read())["span"]
    rows = (
        spark.read.parquet(f"{index_dir}/postings")
        .select("term", "shard", "df_shard")
        .collect()
    )
    hot = [r for r in rows if r["term"] == "the"]
    assert len(hot) == 8, "hot term must be split across all shards"
    for r in rows:
        assert r["df_shard"] <= span, (
            f"group ({r['term']}, shard {r['shard']}) exceeds span"
        )


def test_skewed_corpus_rank_identity(spark, skewed_index):
    index_dir, rows = skewed_index
    engine = SearchEngine(spark, index_dir, preload=True)
    stats = oracle.build_stats(
        [r[0] for r in rows], (tokenize_stem(r[1]) for r in rows)
    )
    for q in ["the", "the w1 w2", "w5", "", "absentterm the"]:
        toks = tokenize_stem(q)
        got = engine.search_tokens(toks, 30)
        want = [(d, s) for d, s in oracle.top_k(stats, toks, 30)]
        assert got == want, f"query {q!r}"


def test_perf_log_sink(spark, skewed_index, tmp_path):
    from lean_explore_spark.query.service import SearchService

    index_dir, _ = skewed_index
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    svc = SearchService(spark, index_dir, emb)
    log = tmp_path / "perf.jsonl"
    svc.search("the w1", log_path=str(log), sim_threshold=-1.0)
    svc.search("", log_path=str(log))
    events = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert [e["status"] for e in events] == ["SUCCESS", "EMPTY_QUERY"]
    assert all("duration_ms" in e and "timestamp" in e for e in events)


def test_salted_two_stage_agg_matches_direct_and_splits_hot_key(spark):
    """The generic salt defuse: same answer as a direct groupBy, and
    stage 1 demonstrably splits the hot key across salt buckets."""
    import pyspark.sql.functions as F

    from lean_explore_spark.operators.relational import salted_two_stage_count

    # 100k rows, 90% one hot key
    df = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key")
    )
    got = {
        r["key"]: r["n"] for r in salted_two_stage_count(df, "key").collect()
    }
    want = {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want
    assert got["HOT"] == 90_000
    # stage-1 partials for the hot key actually spread over many salts
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(16)),
    )
    n_salts = (
        salted.where(F.col("key") == "HOT")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 16


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Co-located join via bucketed tables (the brief's bucketing
    lever): two tables bucketed by the join key join with ZERO
    Exchange in the plan — at 100 TB this is the difference between a
    full shuffle of both sides and a local zip of buckets."""
    import contextlib
    import io

    import pyspark.sql.functions as F

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '{tmp_path}/warehouse'"
    )
    try:
        a = spark.range(0, 20_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 20_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        for name, df in (("ta", a), ("tb", b)):
            (
                df.write.bucketBy(8, "k").sortBy("k")
                .mode("overwrite")
                .saveAsTable(f"buckdemo.{name}")
            )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("buckdemo.ta").join(
                spark.table("buckdemo.tb"), "k"
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain(mode="simple")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert joined.count() == 20_000
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")


def test_salt_auto_spreads_identical_rows_from_files(spark, tmp_path):
    """r4 VERDICT #7: for file-backed inputs the DEFAULT salt mixes in
    the hidden _metadata (file_path, row_index), so a hot key made of
    byte-IDENTICAL rows still spreads across salt buckets without the
    caller supplying salt_expr (the all-columns hash sent them all to
    one bucket).  Result unchanged vs a direct groupBy."""
    import pyspark.sql.functions as F

    from lean_explore_spark.operators.relational import (
        _default_salt_expr,
        salted_two_stage_count,
    )

    # 10k rows, 90% byte-identical ("HOT") — written to parquet so the
    # scan exposes _metadata
    src = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key")
    )
    src.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "t"))
    df = spark.read.parquet(str(tmp_path / "t"))

    got = {
        r["key"]: r["n"] for r in salted_two_stage_count(df, "key").collect()
    }
    assert got["HOT"] == 9_000
    assert got == {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    # the identical rows really spread: default salt on the file scan
    n_salts = (
        df.withColumn("_salt", F.pmod(_default_salt_expr(df), F.lit(16)))
        .where(F.col("key") == "HOT")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 16
    # non-file plans keep the all-columns fallback (identical rows
    # collapse to one bucket there — the documented limitation)
    mem = spark.createDataFrame([("HOT",)] * 100, "key string")
    n_mem = (
        mem.withColumn("_salt", F.pmod(_default_salt_expr(mem), F.lit(16)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_mem == 1


def test_keep_first_dedup_paths_have_no_window(spark):
    """r7 skew hardening: the keep-first decisions in dedup_lines and
    cut_dup_spans must plan as partial-aggregable min(struct) +
    equi-join, NEVER a row_number window keyed on line/span hash — a
    corpus-wide hot line (cookie banner on 1e11 docs) piles every
    occurrence into one window partition, an unsplittable straggler,
    while HashAggregate combines map-side and AQE splits the join.
    Also exercises the hot-key case: one boilerplate line on EVERY doc
    plus per-doc unique lines — exactly one global copy survives."""
    import contextlib
    import io

    import pyspark.sql.functions as F  # noqa: F401

    from lean_explore_spark.operators import dedup as D

    rows = [
        (i, f"unique line {i} alpha beta\nBOILER PLATE ACCEPT COOKIES")
        for i in range(1, 2001)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.dedup_lines(docs, keep="first")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "HashAggregate" in plan

    res = {r.doc_id: r.n_removed_lines for r in out.collect()}
    assert res[1] == 0                      # global first copy kept
    assert all(res[i] == 1 for i in range(2, 2001))
    assert sum(res.values()) == 1999

    # span path: same plan promise
    span_docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(8)) + f" tail{i}")
         for i in range(1, 51)],
        "doc_id long, text string",
    )
    cut = D.cut_dup_spans(span_docs, keep="first")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cut.explain(mode="simple")
    # dup_span_runs' gaps-and-islands window is doc_id-keyed (bounded
    # by doc length — fine); what must NOT exist is a window keyed on
    # the span hash
    for line in buf.getvalue().splitlines():
        if "Window" in line:
            assert "span_key" not in line, line


def test_ngram_jaccard_quadratic_guard(spark):
    """VERDICT r7 #6: ngram_jaccard_pairs is exact-but-O(n²) by design;
    above max_docs it must refuse with guidance (default) or auto-route
    to the candidate-bounded jaccard_refined_pairs — and the routed
    result must equal the all-pairs result on a corpus where the LSH
    bands recall every qualifying pair (identical near-dup texts)."""
    from lean_explore_spark.operators import dedup as D

    # twin docs are IDENTICAL (jaccard 1.0 — always LSH-recalled);
    # non-twins share no shingles (jaccard 0), so all-pairs and
    # LSH+refine must return the same pair set
    rows = [
        (i, " ".join(f"p{i // 2}w{j}" for j in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # under the cap: runs all-pairs
    full = D.ngram_jaccard_pairs(docs, max_docs=1000)
    got_full = {(r.doc_a, r.doc_b, r.jaccard) for r in full.collect()}
    assert got_full  # the tail{i//2} twins are near-identical pairs

    # over the cap: default errors with routing guidance...
    with pytest.raises(ValueError, match="jaccard_refined_pairs"):
        D.ngram_jaccard_pairs(docs, max_docs=10).count()

    # ...and on_overflow='refine' auto-routes to the LSH+refine path,
    # which returns the same exact-jaccard pairs here
    routed = D.ngram_jaccard_pairs(docs, max_docs=10, on_overflow="refine")
    got_routed = {(r.doc_a, r.doc_b, r.jaccard) for r in routed.collect()}
    assert got_routed == got_full

    # explicit opt-out still allows the all-pairs join
    assert (
        D.ngram_jaccard_pairs(docs, max_docs=None).count() == len(got_full)
    )
