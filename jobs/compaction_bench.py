"""Tiered-compaction throughput at rebuild scale (r5 VERDICT #8):
evidence that ``compact_tiered`` is O(small-tier docs), not O(corpus),
and that it holds its throughput while a streaming sink keeps
registering segments (the r5 manifest lock made that safe; this
measures that it is also CHEAP).

Design: one 400k-doc corpus split as a large base (never rewritten by
tiered compaction) plus a segment tail.  For each tail shape the job
measures the tiered-merge wall; the contrast row measures a FULL
compaction (base+tail folded into a monolith) on the same root.  If
the O(small-tier) claim holds, tiered wall tracks the merged-tier doc
count and full compaction tracks the corpus.  ``--ingest`` starts a
thread that registers pre-built tiny segments every 150 ms during the
tiered merge and asserts every registration survives the flip
(concurrency measured, not just stress-tested).

Usage:
    python jobs/compaction_bench.py [--pages 400000] [--base 360000]
        [--tails 2000x5,8000x5] [--full-contrast] [--ingest]
        [--workdir /tmp/compaction_bench] [--cpus N]
Prints one JSON line; commit it under bench_raw/.  Long run → tmux
(CLAUDE.md §Benchmarking).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "jobs"))


def build_segment(spark, docs_df, seg_dir: Path, shards: int) -> None:
    from lean_explore_spark.index.builder import IndexBuilder

    IndexBuilder(
        spark, str(seg_dir), num_shards=shards, num_buckets=8
    ).build(docs_df, resume=False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--base", type=int, default=360_000)
    ap.add_argument("--tails", default="2000x5,7500x5")
    ap.add_argument("--full-contrast", action="store_true")
    ap.add_argument("--ingest", action="store_true")
    ap.add_argument("--workdir", default="/tmp/compaction_bench")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()

    from scaling import ensure_input

    from lean_explore_spark.pyfiles import ensure_py_files
    from lean_explore_spark.session import get_spark
    from lean_explore_spark.streaming import incremental as I

    spark = get_spark(
        app_name="compaction_bench",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)

    work = Path(args.workdir)
    inp = work / f"pages_{args.pages}"
    ensure_input(args.pages, inp, spark=spark)
    corpus = spark.read.parquet(str(inp)).select("doc_id", "text")
    # deterministic split: ascending doc_id, base = first --base docs.
    # doc_ids are uniform hashes, so a threshold id splits by count.
    ids = corpus.select("doc_id").orderBy("doc_id")
    base_hi = ids.offset(args.base - 1).limit(1).collect()[0][0]
    base_docs = corpus.where(f"doc_id <= {base_hi}")
    tail_docs = corpus.where(f"doc_id > {base_hi}").orderBy("doc_id")

    out = {
        "pages": args.pages,
        "base_docs": args.base,
        "shards": args.shards,
        "configs": [],
    }

    # materialize the tail once; slices are row ranges over it
    tail_rows = tail_docs.collect()
    print(
        f"# corpus {args.pages}, base {args.base}, tail {len(tail_rows)}",
        file=sys.stderr,
    )

    base_built = work / "base_idx"
    if not (base_built / "stats.json").exists():
        t0 = time.time()
        build_segment(spark, base_docs, base_built, args.shards)
        print(f"# base build {time.time()-t0:.1f}s", file=sys.stderr)

    for cfg in args.tails.split(","):
        seg_size, n_segs = (int(x) for x in cfg.split("x"))
        root = work / f"root_{seg_size}x{n_segs}"
        if root.exists():
            shutil.rmtree(root)
        root.mkdir(parents=True)
        # base: hardlink copy (contents immutable under tiered merge)
        shutil.copytree(base_built, root / "base", copy_function=os.link)
        seg_root = root / "segments"
        seg_root.mkdir()
        need = seg_size * n_segs
        reserve = 3 * 200 if args.ingest else 0  # ingest rows come
        # from the END of the tail so they never overlap segment rows
        if need > len(tail_rows) - reserve:
            raise SystemExit(f"tail too small for {cfg}")
        for si in range(n_segs):
            rows = tail_rows[si * seg_size : (si + 1) * seg_size]
            sdf = spark.createDataFrame(rows, "doc_id long, text string")
            build_segment(spark, sdf, seg_root / f"seg={si}", 4)
            I.register_segment(root, f"seg={si}")

        ingest_segs = []
        if args.ingest:
            # pre-build tiny out-of-band segments; a thread registers
            # them DURING the merge — every one must survive the flip
            extra = tail_rows[len(tail_rows) - reserve :]
            for xi in range(3):
                rows = extra[xi * 200 : (xi + 1) * 200]
                sdf = spark.createDataFrame(
                    rows, "doc_id long, text string"
                )
                build_segment(
                    spark, sdf, seg_root / f"seg=ingest{xi}", 2
                )
                ingest_segs.append(f"seg=ingest{xi}")

        stop = threading.Event()
        registered = []

        def ingester():
            # land DURING the merge build, past the tier snapshot —
            # a pre-snapshot registration would legitimately be
            # chosen as the smallest tier member and merged
            time.sleep(0.3)
            for name in ingest_segs:
                if stop.is_set():
                    return
                I.register_segment(root, name)
                registered.append(name)
                time.sleep(0.15)

        th = None
        if args.ingest:
            th = threading.Thread(target=ingester)

        # merge everything but the largest segment into one:
        # max_segments=2 folds (n_segs - 1) smallest segments
        before = I.SegmentedSearch(spark, str(root)).n_docs
        t0 = time.time()
        if th:
            th.start()
        res = I.compact_tiered(
            spark, str(root), max_segments=2,
            num_shards=4, num_buckets=8,
        )
        wall = time.time() - t0
        stop.set()
        if th:
            th.join()
        live = set(I.live_segments(root))
        for name in registered:
            assert name in live, f"ingested {name} lost during merge"
        after = I.SegmentedSearch(spark, str(root)).n_docs
        assert after == before + 200 * len(registered), (after, before)
        merged_docs = seg_size * len(res["merged"])
        cfg_out = {
            "tail": cfg,
            "merged_segments": len(res["merged"]),
            "merged_docs": merged_docs,
            "tiered_wall_sec": round(wall, 3),
            "tiered_docs_per_sec": round(merged_docs / wall, 1),
            "ingested_during_merge": len(registered),
        }
        if args.full_contrast:
            t0 = time.time()
            I.compact(
                spark, str(root), str(work / f"mono_{cfg}"),
                num_shards=args.shards, num_buckets=8,
            )
            cfg_out["full_compact_wall_sec"] = round(time.time() - t0, 3)
            cfg_out["full_compact_docs"] = after
        out["configs"].append(cfg_out)
        print(f"# {cfg}: {json.dumps(cfg_out)}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
