"""Physical-plan assertions: the optimizations the 100 TB story relies
on must actually appear in the plan (SURVEY.md §4 R1-R4) — partition
pruning + predicate pushdown on the postings read, broadcast joins for
dim lookups, column pruning on wide scans, whole-stage codegen."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from lean_explore_spark.index.builder import IndexBuilder, term_bucket
from lean_explore_spark.operators import relational as R
from tests.conftest import SF_ORACLE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("planidx") / "idx"
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=4, num_buckets=8).build(
        docs, resume=False
    )
    return str(out)


def test_postings_read_prunes_partitions_and_pushes_terms(spark, index_dir):
    term = "group"
    bucket = term_bucket(term, 8)
    df = (
        spark.read.parquet(f"{index_dir}/postings")
        .where(F.col("bucket") == bucket)
        .where(F.col("term") == term)
        .select("term", "df_shard")
    )
    plan = plan_of(df)
    # bucket is a partition directory → partition filter, not data filter
    assert "PartitionFilters" in plan and "bucket" in plan
    # term predicate reaches the parquet reader (row-group min/max cut,
    # postings are term-sorted within each bucket at build time)
    assert "PushedFilters" in plan
    assert "EqualTo(term,group)" in plan.replace(" ", "").replace("'", "")
    # payload column pruned away
    assert "payload" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_dim_joins_are_broadcast(spark):
    plan = plan_of(R.region_rollup(spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_anti_join_shape(spark):
    plan = plan_of(R.customers_without_orders(spark, SF_ORACLE))
    assert "LeftAnti" in plan


def test_pricing_summary_pushdown_and_codegen(spark):
    df = R.pricing_summary(spark, SF_ORACLE)
    plan = plan_of(df)
    # shipdate predicate pushed to the scan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # only needed columns read (no orderkey/partkey/suppkey in schema)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_returnflag" in read_schema
    # AQE hides codegen spans pre-execution (isFinalPlan=false);
    # codegen mode generates the actual stages
    plan_codegen = plan_of(df, mode="codegen")
    assert "WholeStageCodegen" in plan_codegen


def test_partial_aggregation_before_shuffle(spark):
    # TPC-H Q1 shape: HashAggregate appears twice (partial + final)
    plan = plan_of(R.pricing_summary(spark, SF_ORACLE), mode="simple")
    assert plan.count("HashAggregate") >= 2


def test_pack_plan_single_exchange_and_pruned_staging_scan(spark, index_dir):
    """The pack stage is ONE shuffle (repartition by shard/bucket
    expressions), and its staging scan reads only (doc_id, tf_map) —
    shard comes from partition pruning, doc_len never rides the
    channel (r2: nor do materialized shard/bucket columns)."""
    import json as _json
    from pathlib import Path

    b = IndexBuilder(spark, index_dir, num_shards=4, num_buckets=8)
    b.num_shards = _json.loads(
        (Path(index_dir) / "stats.json").read_text()
    )["num_shards"]
    plan = plan_of(b._pack_plan([0, 1, 2, 3], avgdl=70.0), mode="simple")
    assert plan.count("Exchange") == 1
    # column pruning on the forward-index scan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "doc_len" not in scan[0]
    assert "tf_map" in scan[0]
    assert "PartitionFilters: [shard" in scan[0]


def test_hybrid_topk_plan_is_candidate_pruned(spark):
    """r2 VERDICT #1: the hybrid contract plan must not globally sort
    or broadcast a corpus-sized relation — candidates flow top-k
    (TakeOrderedAndProject) → broadcast into the term-pruned postings
    scan; the only orderings are TakeOrdered cuts."""
    import __spark_entry__ as E

    df = E.q_hybrid_topk(spark, SF_ORACLE)
    plan = plan_of(df, mode="simple")
    assert "SortMergeJoin" not in plan
    assert "Sort " not in plan and "Sort[" not in plan  # TakeOrdered only
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_r7_curation_plans_hold_their_shape(spark):
    """The r7 curation operators' 100 TB promises, pinned as plan
    assertions (COVERAGE.md rows): quality batteries are ZERO-exchange
    narrow projections; unigram_nll and decontaminate broadcast their
    small side and never sort-merge; pack_sequences' global prefix sum
    must NOT be the single-partition global window."""
    from lean_explore_spark.operators import dedup as D
    from lean_explore_spark.operators import pii as P
    from lean_explore_spark.operators import textstats as T

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )

    for op in (T.gopher_quality, T.c4_quality, P.scrub_pii):
        plan = plan_of(op(docs), mode="simple")
        assert "Exchange" not in plan, op.__name__

    plan = plan_of(T.unigram_nll(docs), mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan

    probes = T.hash_sample(docs, 20, salt="contam")
    plan = plan_of(D.decontaminate(docs, probes), mode="simple")
    assert "BroadcastHashJoin" in plan

    plan = plan_of(T.pack_sequences(docs), mode="simple")
    # the trap plan is Window with an empty partition spec, which
    # plans as Exchange SinglePartition feeding the Window
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan and "_pid" in plan
