"""Stored-artifact incremental near-dup gate (VERDICT r7 #2): the
corpus-side state persists once at build/segment time and refresh
batches run dedup.novel_docs_stored against it — counts identical to
the self-contained recompute path, old corpus text never rescanned."""

from __future__ import annotations

import json

import pytest

from lean_explore_spark.operators import dedup as D

BASE_A = ("the quick brown fox jumps over the lazy dog while rain "
          "falls softly on the quiet village roofs tonight")
BASE_B = ("completely different content about database engines and "
          "vectorized execution plans with columnar storage formats")


@pytest.fixture(scope="module")
def corpus(spark):
    import random

    rng = random.Random(42)
    vocab = [f"word{i}" for i in range(120)]
    old_rows = [(i, " ".join(rng.choice(vocab) for _ in range(30)))
                for i in range(1, 61)]
    old_rows += [(100, BASE_A), (101, BASE_B)]
    # new batch: exact copy, near-dup (suffix noise), fresh docs, and a
    # doc too short to shingle
    new_rows = [
        (200, BASE_A),
        (201, BASE_A + " zz qq ww"),
        (202, old_rows[5][1]),
        (203, "entirely fresh text about gardening tips and soil"),
        (204, "hi"),
    ] + [(210 + i, " ".join(rng.choice(vocab) for _ in range(25)))
         for i in range(10)]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    return old, new


@pytest.fixture(scope="module")
def artifact(spark, corpus, tmp_path_factory):
    old, _ = corpus
    path = str(tmp_path_factory.mktemp("gate") / "near_dup")
    meta = D.write_near_dup_artifact(old, path)
    return path, meta


def test_artifact_layout_and_meta(spark, artifact, corpus):
    path, meta = artifact
    old, _ = corpus
    assert meta == {"n": 3, "num_hashes": D.NUM_HASHES,
                    "band_rows": D.BAND_ROWS}
    disk = json.loads(open(f"{path}/{D.NEAR_DUP_META}").read())
    assert disk == meta
    keys = spark.read.parquet(f"{path}/band_keys")
    assert set(keys.columns) == {"doc_id", "band", "band_key"}
    # every shingle-able old doc carries every band
    n_bands = D.NUM_HASHES // D.BAND_ROWS
    per_doc = {r["doc_id"]: r["cnt"] for r in
               keys.groupBy("doc_id").count()
                   .withColumnRenamed("count", "cnt").collect()}
    assert all(v == n_bands for v in per_doc.values())
    ints = spark.read.parquet(f"{path}/shingle_ints")
    assert set(ints.columns) == {"doc_id", "x"}
    # distinct 60-bit ints == distinct string shingles per doc
    want = dict(
        D.shingles(old).groupBy("doc_id").count().collect()
    )
    got = dict(ints.groupBy("doc_id").count().collect())
    assert got == want


@pytest.mark.parametrize("refine", [True, False])
def test_stored_gate_matches_recompute(spark, corpus, artifact, refine):
    old, new = corpus
    path, _ = artifact
    want = sorted(
        r["doc_id"]
        for r in D.novel_docs(new, old, refine=refine).collect()
    )
    got = sorted(
        r["doc_id"]
        for r in D.novel_docs_stored(new, path, refine=refine).collect()
    )
    assert got == want
    # the crafted cases behave: copies/near-dups dropped, fresh + tiny kept
    assert 200 not in got and 201 not in got and 202 not in got
    assert 203 in got and 204 in got


def test_stored_gate_threshold_routes_through_refine(spark, corpus, artifact):
    _, new = corpus
    path, _ = artifact
    # threshold=0 with refine drops every band-candidate (any overlap
    # qualifies); threshold just above the near-dup's jaccard keeps it
    strict = {r["doc_id"] for r in
              D.novel_docs_stored(new, path, threshold=0.999).collect()}
    assert 201 in strict          # suffix-noise near-dup survives at 0.999
    assert 200 not in strict      # exact copy is jaccard 1.0


def test_builder_emits_artifact_and_gate_runs(spark, corpus, tmp_path):
    from lean_explore_spark.index.builder import IndexBuilder

    old, new = corpus
    out = tmp_path / "idx"
    stats = IndexBuilder(spark, str(out), num_shards=4, num_buckets=4).build(
        old, resume=False, near_dup_artifact=True
    )
    assert "near_dup_artifact_sec" in stats["stage_timings"]
    gate_dir = f"{out}/near_dup"
    assert json.loads(open(f"{gate_dir}/{D.NEAR_DUP_META}").read())["n"] == 3
    got = sorted(
        r["doc_id"] for r in D.novel_docs_stored(new, gate_dir).collect()
    )
    want = sorted(
        r["doc_id"] for r in D.novel_docs(new, old).collect()
    )
    assert got == want


def test_streaming_ingest_gated_by_stored_artifact(spark, tmp_path):
    """r8 streaming hook: micro-batches gate through the STORED
    artifact before indexing; accepted batches append epoch deltas so
    later batches dedup against earlier segments too; the replay
    guard keeps a re-run epoch from matching itself."""
    from lean_explore_spark.streaming import incremental as I

    def doc(i, text):
        return (i, text)

    base_rows = [
        doc(1, BASE_A), doc(2, BASE_B),
        doc(3, "some entirely separate base document about storage "
               "engines compaction levels and bloom filters today"),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    gate = str(tmp_path / "near_dup")
    D.write_near_dup_artifact(base, gate)

    fresh_a = ("fresh crawl text on gardening tomatoes rainfall "
               "irrigation schedules and mulching for sandy soils")
    fresh_c = ("another later snapshot document about sailing knots "
               "rigging tension and tide tables for narrow harbors")
    pages = tmp_path / "pages"
    pages.mkdir()
    idx_root = str(tmp_path / "idx")

    # ---- crawl snapshot 1: a base dup + one fresh doc
    spark.createDataFrame(
        [doc(100, BASE_A), doc(101, fresh_a)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(pages))
    q = I.start_incremental_indexing(
        spark, str(pages), idx_root,
        num_shards=2, num_buckets=4, near_dup_gate=gate,
    )
    q.awaitTermination(300)
    segs = I.live_segments(idx_root)
    assert len(segs) == 1
    got1 = sorted(
        r.doc_id for r in spark.read.parquet(
            f"{idx_root}/segments/{segs[0]}/forward"
        ).select("doc_id").collect()
    )
    assert got1 == [101]  # base dup dropped, fresh kept
    import json as _json
    from pathlib import Path
    deltas = sorted((Path(gate) / "delta").glob("epoch=*"))
    assert len(deltas) == 1 and (deltas[0] / "_DELTA_DONE").exists()

    # ---- crawl snapshot 2: base dup, dup of snapshot-1's fresh doc
    # (dropped ONLY because the epoch delta extended the gate), fresh
    spark.createDataFrame(
        [doc(200, BASE_B), doc(201, fresh_a), doc(202, fresh_c)],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(str(pages))
    q = I.start_incremental_indexing(
        spark, str(pages), idx_root,
        num_shards=2, num_buckets=4, near_dup_gate=gate,
    )
    q.awaitTermination(300)
    segs = sorted(I.live_segments(idx_root))
    assert len(segs) == 2
    new_seg = [s for s in segs if s != "seg=0"][0] if "seg=0" in segs else segs[-1]
    got2 = sorted(
        r.doc_id for r in spark.read.parquet(
            f"{idx_root}/segments/{new_seg}/forward"
        ).select("doc_id").collect()
    )
    assert got2 == [202]

    # ---- replay guard: re-gating snapshot 2 with its own delta
    # excluded keeps 202; WITHOUT the exclusion it matches itself
    batch2 = spark.createDataFrame(
        [doc(200, BASE_B), doc(201, fresh_a), doc(202, fresh_c)],
        "doc_id long, text string",
    )
    epoch2 = int(new_seg.split("=")[1])
    kept_guarded = sorted(
        r.doc_id for r in D.novel_docs_stored(
            batch2, gate, exclude_epochs=(epoch2,)
        ).collect()
    )
    assert kept_guarded == [202]
    kept_unguarded = sorted(
        r.doc_id for r in D.novel_docs_stored(batch2, gate).collect()
    )
    assert kept_unguarded == []  # self-match — why the guard exists


def test_consolidate_folds_deltas_into_new_generation(spark, tmp_path):
    """Artifact lifecycle (r8): consolidation folds committed deltas
    into a new base generation — gate results unchanged, delta dirs
    swept, consumed epochs recorded explicitly so a resurrected
    (replayed) consumed delta dir is ignored rather than double-
    counting shingles."""
    import json as _json
    from pathlib import Path

    base = spark.createDataFrame(
        [(1, BASE_A), (2, BASE_B)], "doc_id long, text string"
    )
    gate = str(tmp_path / "gate")
    D.write_near_dup_artifact(base, gate)

    batch1 = spark.createDataFrame(
        [(10, "fresh text about gardening tomatoes rainfall and soil")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(20, "different fresh text about sailing knots and rigging")],
        "doc_id long, text string",
    )
    D.append_near_dup_delta(batch1, gate, 0)
    D.append_near_dup_delta(batch2, gate, 1)

    probe = spark.createDataFrame(
        [(100, BASE_A),                     # dup of base
         (101, batch1.collect()[0].text),   # dup of delta 0
         (102, batch2.collect()[0].text),   # dup of delta 1
         (103, "totally novel content nobody has ever written before")],
        "doc_id long, text string",
    )
    before = sorted(
        r.doc_id for r in D.novel_docs_stored(probe, gate).collect()
    )
    assert before == [103]

    out = D.consolidate_near_dup_artifact(spark, gate)
    assert out == {"gen": 1, "consolidated": 2}
    meta = _json.loads((Path(gate) / D.NEAR_DUP_META).read_text())
    assert meta["gen"] == 1 and meta["consumed_epochs"] == []
    assert not list((Path(gate) / "delta").glob("epoch=*"))
    assert not (Path(gate) / "band_keys").exists()  # old gen swept
    after = sorted(
        r.doc_id for r in D.novel_docs_stored(probe, gate).collect()
    )
    assert after == before

    # a post-consolidation delta still applies...
    batch3 = spark.createDataFrame(
        [(30, "totally novel content nobody has ever written before")],
        "doc_id long, text string",
    )
    D.append_near_dup_delta(batch3, gate, 2)
    assert sorted(
        r.doc_id for r in D.novel_docs_stored(probe, gate).collect()
    ) == []  # 103 now matches batch3
    # ...and a second consolidation advances the generation
    out2 = D.consolidate_near_dup_artifact(spark, gate)
    assert out2 == {"gen": 2, "consolidated": 1}
    assert sorted(
        r.doc_id for r in D.novel_docs_stored(probe, gate).collect()
    ) == []

    # crash simulation: a consumed delta resurrected by an epoch
    # replay must be IGNORED (meta marks it consumed) — shingle
    # counts would otherwise double and jaccard sizes break
    meta = _json.loads((Path(gate) / D.NEAR_DUP_META).read_text())
    meta["consumed_epochs"] = [2]
    (Path(gate) / D.NEAR_DUP_META).write_text(_json.dumps(meta))
    D.append_near_dup_delta(batch3, gate, 2)  # replayed dir reappears
    assert sorted(
        r.doc_id for r in D.novel_docs_stored(probe, gate).collect()
    ) == []  # content still applies via gen=2; delta dir ignored
