"""Structured-Streaming incremental indexing: segments stream in via
foreachBatch, segmented search is rank-identical to a monolithic
rebuild, compaction preserves results, restart is exactly-once."""

from __future__ import annotations

import time
from pathlib import Path

import pytest

from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query.search import SearchEngine
from lean_explore_spark.sources import pages as P
from lean_explore_spark.streaming import incremental as I

QUERIES = ["the data page", "compress encode block", "theorem definition group"]


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    pages_dir = base / "pages"
    docs = P.assign_doc_ids(
        P.extract_text(P.generate_pages(spark, 400, partitions=4))
    ).select("doc_id", P.F.col("extracted_text").alias("text"))
    # several files so maxFilesPerTrigger yields multiple micro-batches
    docs.repartition(8).write.mode("overwrite").parquet(str(pages_dir))

    index_root = base / "idx"
    q = I.start_incremental_indexing(
        spark, str(pages_dir), str(index_root), num_shards=2, num_buckets=4
    )
    q.awaitTermination(300)
    return str(pages_dir), str(index_root), docs


def test_segments_created(spark, streamed):
    _, index_root, _ = streamed
    segs = sorted(Path(index_root, "segments").glob("seg=*"))
    assert len(segs) >= 2  # multiple micro-batches
    for s in segs:
        assert (s / "stats.json").exists()


def test_segmented_search_rank_identical_to_monolithic(spark, streamed, tmp_path):
    pages_dir, index_root, docs = streamed
    seg = I.SegmentedSearch(spark, index_root)

    mono_dir = tmp_path / "mono"
    IndexBuilder(spark, str(mono_dir), num_shards=2, num_buckets=4).build(
        spark.read.parquet(pages_dir), resume=False
    )
    mono = SearchEngine(spark, str(mono_dir), preload=True)

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    stats = oracle.build_stats(
        [r["doc_id"] for r in rows], (tokenize_stem(r["text"]) for r in rows)
    )
    cold = I.SegmentedSearch(spark, index_root, preload=False)
    for q in QUERIES:
        toks = tokenize_stem(q)
        want = [(d, s) for d, s in oracle.top_k(stats, toks, 15)]
        assert mono.search_tokens(toks, 15) == want, f"mono {q!r}"
        assert seg.search(q, 15) == want, f"segmented {q!r}"
        assert cold.search(q, 15) == want, f"segmented cold {q!r}"


def test_compaction_preserves_results(spark, streamed, tmp_path):
    pages_dir, index_root, docs = streamed
    out = tmp_path / "compacted"
    I.compact(spark, index_root, str(out), num_shards=2, num_buckets=4)
    eng = SearchEngine(spark, str(out), preload=True)
    seg = I.SegmentedSearch(spark, index_root)
    for q in QUERIES:
        assert eng.search(q, 15) == seg.search(q, 15), q


def test_restart_is_exactly_once(spark, streamed):
    pages_dir, index_root, _ = streamed
    before = sorted(Path(index_root, "segments").glob("seg=*"))
    # restart with the same checkpoint: no new input → no new segments
    q = I.start_incremental_indexing(
        spark, pages_dir, index_root, num_shards=2, num_buckets=4
    )
    q.awaitTermination(120)
    after = sorted(Path(index_root, "segments").glob("seg=*"))
    assert before == after


def test_tiered_compaction_rank_identical(spark, streamed):
    """compact_tiered folds only the smallest segments into one merged
    segment (base + large segments untouched) and results are
    bit-identical before/after.  MUST run last in this module: it
    mutates the shared segments directory."""
    _, index_root, docs = streamed
    # guarantee ≥3 segments regardless of micro-batch count: land one
    # extra delta segment of fresh docs (disjoint ids via anti-join)
    extra = (
        P.assign_doc_ids(
            P.extract_text(P.generate_pages(spark, 440, partitions=2))
        )
        .select("doc_id", P.F.col("extracted_text").alias("text"))
        .join(docs.select("doc_id"), "doc_id", "left_anti")
        .limit(30)
    )
    assert extra.count() > 0
    IndexBuilder(
        spark,
        str(Path(index_root, "segments", "seg=900")),
        num_shards=2,
        num_buckets=4,
    ).build(extra, resume=False)
    # out-of-band segment writers must register (manifest is authority)
    I.register_segment(index_root, "seg=900")

    seg_before = I.SegmentedSearch(spark, index_root)
    want = {q: seg_before.search(q, 15) for q in QUERIES}

    before = sorted(Path(index_root, "segments").glob("seg=*"))
    assert len(before) >= 3
    out = I.compact_tiered(
        spark, index_root, max_segments=2, num_shards=2, num_buckets=4
    )
    assert len(out["merged"]) == len(before) - 1
    after = sorted(Path(index_root, "segments").glob("seg=*"))
    assert len(after) == out["remaining"] == 2
    assert any("+" in p.name for p in after)  # the merged segment

    seg_after = I.SegmentedSearch(spark, index_root)
    for q in QUERIES:
        assert seg_after.search(q, 15) == want[q], q

    # below threshold → no-op
    noop = I.compact_tiered(spark, index_root, max_segments=2)
    assert noop["merged"] == [] and noop["remaining"] == 2


def test_compaction_crash_states_are_invisible(spark, streamed):
    """Crash-safety (ADVICE r3): dirs left by an interrupted compaction
    — a half-built .tmp- merge, or a complete merged dir renamed into
    place but not yet flipped live in the manifest — are invisible to
    SegmentedSearch and swept by the next compaction run."""
    import shutil

    _, index_root, _ = streamed
    root = Path(index_root)
    live = I.live_segments(root)
    n_before = I.SegmentedSearch(spark, index_root).n_docs

    # crash mid-build: partial .tmp- dir
    tmp = root / "segments" / ".tmp-crashed"
    tmp.mkdir()
    (tmp / "stats.json").write_text("{}")
    # crash between rename and manifest flip: complete-looking merged
    # dir (a live segment's clone under a merged name) — the pre-fix
    # double-count window
    clone = root / "segments" / "seg=888+999"
    shutil.copytree(root / "segments" / live[0], clone)
    # an unlisted PLAIN segment (e.g. a sink epoch mid-build or an
    # unregistered out-of-band build): invisible but NOT swept —
    # compaction can't prove it owns it
    bystander = root / "segments" / "seg=777"
    shutil.copytree(root / "segments" / live[0], bystander)

    assert I.live_segments(root) == live  # manifest is the authority
    assert I.SegmentedSearch(spark, index_root).n_docs == n_before

    out = I.compact_tiered(spark, index_root, max_segments=len(live))
    assert out["merged"] == []  # below threshold — but garbage swept
    assert not tmp.exists() and not clone.exists()
    assert bystander.exists()  # left for its writer to register
    assert I.SegmentedSearch(spark, index_root).n_docs == n_before
    shutil.rmtree(bystander)


@pytest.fixture()
def tiny_root(spark, streamed, tmp_path):
    """Fresh segment root with three tiny REAL segments (sizes 10 <
    20 < 30 docs so the compaction tier pick is deterministic), all
    registered live."""
    _, _, docs = streamed
    root = tmp_path / "idx2"
    for name, n in (("seg=10", 10), ("seg=11", 20), ("seg=12", 30)):
        seg = docs.orderBy("doc_id").limit(n)
        IndexBuilder(
            spark,
            str(root / "segments" / name),
            num_shards=1,
            num_buckets=2,
        ).build(seg, resume=False)
        I.register_segment(root, name)
    return root


def test_concurrent_registration_survives_flip(spark, streamed, tiny_root):
    """ADVICE r4 (medium): a streaming sink that registers a new epoch
    WHILE compact_tiered builds its merge must stay live after the
    manifest flip — the flip re-reads the live set under the lock
    instead of writing back its pre-merge snapshot."""
    _, _, docs = streamed
    root = tiny_root
    # a real finished segment, not yet registered (the sink's epoch)
    late = docs.orderBy(P.F.desc("doc_id")).limit(5)
    IndexBuilder(
        spark, str(root / "segments" / "seg=42"), num_shards=1, num_buckets=2
    ).build(late, resume=False)

    real_fold = I._fold_forward_dirs

    def fold_and_register(*a, **kw):
        # simulate the sink committing an epoch mid-merge
        I.register_segment(root, "seg=42")
        return real_fold(*a, **kw)

    I._fold_forward_dirs = fold_and_register
    try:
        out = I.compact_tiered(
            spark, str(root), max_segments=2, num_shards=1, num_buckets=2
        )
    finally:
        I._fold_forward_dirs = real_fold
    assert out["merged"] == ["seg=10", "seg=11"]
    live = I.live_segments(root)
    assert "seg=42" in live  # the mid-merge registration survived
    assert "seg=10+11" in live and "seg=12" in live
    assert I._manifest_state(root)["sweep"] == []  # inputs fully swept
    assert not (root / "segments" / "seg=10").exists()


def test_sweep_is_explicit_not_inferred(spark, tiny_root):
    """ADVICE r4 (low): only the manifest's explicit sweep list (plus
    .tmp-/'+'-form dirs) is deleted.  A plain unlisted dir whose name
    is a '+'-component of a live merged segment — e.g. a NEW stream
    generation's half-built seg=10 after a checkpoint reset reused
    epoch ids — is no longer inferred to be compaction garbage."""
    import shutil

    root = tiny_root
    seg_root = root / "segments"
    # make seg=10+11 live (clone of a real segment under a merged name)
    shutil.copytree(seg_root / "seg=10", seg_root / "seg=10+11")
    with I._manifest_lock(root):
        st = I._manifest_state(root)
        I._write_state(
            root,
            (set(st["live"]) - {"seg=10", "seg=11"}) | {"seg=10+11"},
            ["seg=11"],  # crashed deletion: 11 delisted, rmtree pending
        )
    # a new-generation epoch reusing id 10: unlisted plain dir
    (seg_root / "seg=10").exists() or shutil.copytree(
        seg_root / "seg=12", seg_root / "seg=10"
    )

    out = I.compact_tiered(spark, str(root), max_segments=8)
    assert out["merged"] == []  # below threshold — sweep only
    assert (seg_root / "seg=10").exists()  # NOT inferred garbage
    assert not (seg_root / "seg=11").exists()  # explicit sweep entry
    assert I._manifest_state(root)["sweep"] == []
    assert sorted(I.live_segments(root)) == ["seg=10+11", "seg=12"]


def test_register_threads_never_lost_during_compaction(spark, tiny_root, streamed):
    """Real-interleaving stress for the r5 manifest lock: 4 threads
    register out-of-band segments in a loop while compact_tiered runs
    its merge.  Every registration must be visible afterwards and no
    live dir deleted — the pre-lock flip lost any registration that
    landed during the merge build."""
    import threading

    _, _, docs = streamed
    root = tiny_root
    # registrations reference real finished dirs (the sweep must
    # never touch them even while unregistered)
    names = [f"seg={100 + i}" for i in range(8)]
    src = docs.orderBy("doc_id").limit(3)
    for n in names:
        IndexBuilder(
            spark, str(root / "segments" / n), num_shards=1, num_buckets=2
        ).build(src, resume=False)

    # registrations start only once the merge BUILD is underway (after
    # the tier pick), so they model sink epochs landing mid-merge —
    # the exact window the pre-lock flip lost
    merge_started = threading.Event()
    real_fold = I._fold_forward_dirs

    def fold_signal(*a, **kw):
        merge_started.set()
        return real_fold(*a, **kw)

    it = iter(names)
    lock = threading.Lock()

    def register_some():
        merge_started.wait(timeout=60)
        while True:
            with lock:
                try:
                    n = next(it)
                except StopIteration:
                    return
            I.register_segment(root, n)

    threads = [threading.Thread(target=register_some) for _ in range(4)]
    for t in threads:
        t.start()
    I._fold_forward_dirs = fold_signal
    try:
        out = I.compact_tiered(
            spark, str(root), max_segments=2, num_shards=1, num_buckets=2
        )
    finally:
        I._fold_forward_dirs = real_fold
    for t in threads:
        t.join(timeout=60)
    assert not any(t.is_alive() for t in threads)

    live = set(I.live_segments(root))
    assert set(names) <= live, set(names) - live  # nothing lost
    assert "seg=10+11" in live and out["merged"] == ["seg=10", "seg=11"]
    for n in names:
        assert (root / "segments" / n / "stats.json").exists()
    assert I._manifest_state(root)["sweep"] == []


def test_segmented_distributed_batch_rank_identical(spark, streamed):
    """r5 VERDICT #2: the distributed/batched segmented path — one
    Spark job over (segment, shard) tasks with union global stats —
    must be bit-identical to the driver-side segmented path (itself
    oracle-identical), for every query in one batch, including empty /
    absent-term / per-query-k shapes, and schedule O(1) jobs."""
    _, index_root, _ = streamed
    seg = I.SegmentedSearch(spark, index_root)
    batch = QUERIES + ["", "nonexistentterm zz", "the the the data"]
    want = [seg.search(q, 15) for q in batch]
    token_lists = [tokenize_stem(q) for q in batch]

    sc = spark.sparkContext
    sc.setJobGroup("seg_dist_batch", "segmented distributed batch")
    try:
        got = seg.search_tokens_distributed_batch(token_lists, 15)
    finally:
        sc.setJobGroup("", "")
    assert got == want
    jobs = sc.statusTracker().getJobIdsForGroup("seg_dist_batch")
    assert 0 < len(jobs) <= 6, len(jobs)  # not O(Q) scheduling

    # single-query wrapper + per-query k + cold engines
    assert seg.search_distributed(QUERIES[0], 7) == seg.search(QUERIES[0], 7)
    ks = [3, 9, 1, 15, 2, 4]
    got_k = seg.search_tokens_distributed_batch(token_lists, ks)
    for q, kv, res in zip(batch, ks, got_k):
        assert res == seg.search(q, kv), (q, kv)
    cold = I.SegmentedSearch(spark, index_root, preload=False)
    assert cold.search_tokens_distributed_batch(token_lists, 15) == want


def test_segment_fsck(spark, streamed, tmp_path):
    """r7 (VERDICT r6 #8): jobs/verify_index.py --segments rechecks
    every manifest-live segment's payload fingerprints against its own
    commit manifest plus stats.json vs the forward store.  Green on
    the streamed index; a tampered stats.json and a live-but-missing
    segment must each flip ok=False with a pointed mismatch row."""
    import json
    import shutil
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from verify_index import verify_segments

    _, index_root, _ = streamed
    out = verify_segments(spark, index_root)
    assert out["ok"], out
    assert out["segments"] >= 2
    assert all(r["ok"] for r in out["results"].values())

    # work on a COPY — the fixture index is module-scoped
    bad_root = tmp_path / "bad_idx"
    shutil.copytree(index_root, bad_root)
    live = I.live_segments(bad_root)
    victim = Path(bad_root, "segments", live[0], "stats.json")
    st = json.loads(victim.read_text())
    st["n_docs"] += 7
    victim.write_text(json.dumps(st))
    I.register_segment(bad_root, "seg=ghost")  # live but not on disk

    out2 = verify_segments(spark, str(bad_root))
    assert not out2["ok"]
    r_tampered = out2["results"][live[0]]
    assert any(
        m.get("field") == "n_docs" for m in r_tampered["mismatches"]
    ), r_tampered
    assert out2["results"]["seg=ghost"]["ok"] is False
    # unregistered out-of-band dirs are reported, not failed
    (Path(bad_root) / "segments" / "seg=oob").mkdir()
    out3 = verify_segments(spark, str(bad_root))
    assert "seg=oob" in out3["unregistered"]


def test_streaming_curation_filter(spark, tmp_path):
    """r7: the per-micro-batch curation hook — a quality predicate
    applied inside foreachBatch keeps failing docs out of EVERY
    segment; the indexed universe equals the filtered corpus."""
    import pyspark.sql.functions as F

    from lean_explore_spark.operators import textstats as T

    base = tmp_path / "curated_stream"
    pages_dir = base / "pages"
    docs = P.assign_doc_ids(
        P.extract_text(P.generate_pages(spark, 200, partitions=2))
    ).select("doc_id", P.F.col("extracted_text").alias("text"))
    docs.repartition(4).write.mode("overwrite").parquet(str(pages_dir))

    def keep_wordy(batch_df):
        # per-doc deterministic predicate: >= 40 whitespace words
        sized = T.token_counts(batch_df).where("ws_tokens >= 40")
        return batch_df.join(sized.select("doc_id"), "doc_id")

    index_root = base / "idx"
    q = I.start_incremental_indexing(
        spark, str(pages_dir), str(index_root),
        num_shards=2, num_buckets=4, curation_filter=keep_wordy,
    )
    q.awaitTermination(300)

    want_ids = {
        r.doc_id
        for r in T.token_counts(spark.read.parquet(str(pages_dir)))
        .where("ws_tokens >= 40")
        .collect()
    }
    assert 0 < len(want_ids) < 200  # the predicate actually splits

    seg = I.SegmentedSearch(spark, str(index_root))
    assert seg.n_docs == len(want_ids)
    got_ids = set()
    for e in seg.engines:
        got_ids.update(e.iter_doc_ids())
    assert got_ids == want_ids
