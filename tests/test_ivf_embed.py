"""IVF coarse-quantizer ANN + batched embedding operator (G3/FAISS
analogs): exactness at full probe, monotone candidates, recall of the
planted near-dup, batch-invariance and per-worker kernel reuse."""

from __future__ import annotations

import numpy as np
import pytest

from lean_explore_spark.operators import embed as E
from lean_explore_spark.operators import similarity as S
from tests.test_similarity_ops import _emb_df, corpus  # noqa: F401

NLIST = 8


@pytest.fixture(scope="module")
def ivf(spark, corpus):  # noqa: F811
    df = _emb_df(spark, corpus).cache()
    centroids, assigned = S.ivf_build(df, nlist=NLIST)
    return df, centroids, assigned.cache()


def test_ivf_assignment_covers_all(ivf):
    df, _, assigned = ivf
    rows = assigned.collect()
    assert len(rows) == df.count()
    lists = {r["list_id"] for r in rows}
    assert lists <= set(range(NLIST)) and len(lists) > 1


def test_ivf_full_probe_equals_exact(ivf):
    """nprobe == nlist scans everything → identical to the exact
    brute-force top-k (cos values to 1e-9; same id set)."""
    df, cent, assigned = ivf
    qvec = np.asarray(
        df.where("vec_id = 5").head()["embedding"], dtype=np.float64
    )
    got = S.ivf_topk(df, assigned, cent, qvec, k=21, nprobe=NLIST).collect()
    exact = {
        r["vec_id"]: r["cos"]
        for r in S.cosine_topk(df, query_vec_id=5, k=340).collect()
    }
    # drop the query vector itself (ivf_topk takes a raw vector and
    # cannot exclude by id; cos≈1.0 row is the query)
    got = [r for r in got if r["vec_id"] != 5][:20]
    assert len(got) == 20
    for r in got:
        assert r["cos"] == pytest.approx(exact[r["vec_id"]], abs=1e-6)
    top5 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert {r["vec_id"] for r in got[:5]} == {k for k, _ in top5}


def test_ivf_probe_monotone_and_finds_planted_dup(ivf):
    df, cent, assigned = ivf
    qvec = np.asarray(
        df.where("vec_id = 5").head()["embedding"], dtype=np.float64
    )
    sizes = []
    for nprobe in (1, 2, 4, NLIST):
        rows = S.ivf_topk(df, assigned, cent, qvec, k=340, nprobe=nprobe)
        sizes.append(rows.count())
    assert sizes == sorted(sizes)
    # the planted near-dup (305 = 5 + 300) shares the query's nearest
    # centroid — nprobe=1 must surface it at the top
    one = S.ivf_topk(df, assigned, cent, qvec, k=3, nprobe=1).collect()
    assert any(r["vec_id"] == 305 for r in one)


def test_embed_texts_matches_stub_and_is_batch_invariant(spark):
    from lean_explore_spark.query.service import stub_embedder

    rows = [(i, f"document number {i} about data") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["vec_id"]: np.array(r["embedding"])
        for r in E.embed_texts(docs, batch_size=7).collect()
    }
    assert len(out) == 100
    ref = stub_embedder(E.DEFAULT_DIM)
    for i, text in rows[:10]:
        want = ref(text).astype(np.float32)
        assert np.allclose(out[i], want, atol=1e-7)
        assert abs(np.linalg.norm(out[i]) - 1.0) < 1e-5
    # batch-size and partitioning invariance
    out2 = {
        r["vec_id"]: np.array(r["embedding"])
        for r in E.embed_texts(docs.repartition(13), batch_size=64).collect()
    }
    for i in out:
        assert np.array_equal(out[i], out2[i])


def test_embed_kernel_instantiated_per_worker_not_per_batch(spark):
    """predict_batch_udf shape: the factory runs once per task/worker,
    not once per Arrow batch (model-load amortization)."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, f"t {i}") for i in range(64)], "doc_id long, text string"
    ).repartition(2)
    calls = spark.sparkContext.accumulator(0)

    def counting_factory():
        calls.add(1)
        kernel = E.hash_kernel_factory(8)
        return kernel

    # force many small Arrow batches so per-batch instantiation would
    # show up as calls >> partitions
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        n = E.embed_texts(
            docs, embedder_factory=counting_factory, batch_size=4
        ).count()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert n == 64
    assert calls.value <= 4  # ≤ tasks (2 partitions, maybe retried)
