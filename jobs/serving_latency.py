"""Serving-latency table at rebuild scale (r4 VERDICT #5): p50/p95
over the 299-query reference set, per serving mode, on the CURRENT
serving path (LRU cold cache, O(k) TakeOrdered distributed merge,
manifest-gated segments — r2's 400k numbers predate all of these).

Modes:

* ``preloaded``  — dictionary+postings pinned in driver memory
  (reference-style asset preload; the latency-critical config).
* ``cold``       — ``preload=False``: every lookup is a pruned Spark
  read (bucket partition pruning + term pushdown), LRU-bounded
  doc-length cache; nothing corpus-sized on the driver.
* ``distributed``— one Spark task per doc-shard running block-max
  WAND, O(k) TakeOrderedAndProject merge to the driver.
* ``distributed_batch`` (opt-in via --modes) — the whole sweep in ONE
  Spark job (search_tokens_distributed_batch, r5); reports wall+QPS
  only, since per-query latency is meaningless inside a batch.
* ``auto`` (r8, VERDICT r7 #5) — posting-mass routing: light queries
  take the sequential preloaded kernel, queries whose Σ df crosses
  SearchEngine.HOT_MASS_THRESHOLD fan shards across threads
  (search_tokens_routed).  ``parallel`` forces the threaded kernel on
  every query (threshold ablation).  Both bit-identical to preloaded.
* ``hybrid_driver`` / ``hybrid_spark`` / ``hybrid_ann`` (opt-in) —
  the FULL hybrid pipeline (embed → cosine candidates → threshold →
  candidate BM25 → combine), embedding matrix preloaded / per-query
  Spark scan / LSH-probe-pruned scan (r5 VERDICT #6; reference
  anchor benchmark_search_rate.py:301-358 measures hybrid, not BM25).
* ``hybrid_spark_batch`` / ``hybrid_ann_batch`` (opt-in) — the r6
  batched hybrid sweep (~2 Spark jobs for the whole query set);
  wall+QPS only.

Per-query latency is min-of-``--repeats`` (the robust estimator on a
±2-3× CPU-steal VM — BENCH.md §0); the reported wall is the best
single sweep.  Reference anchor: benchmark_search_rate.py:301-358
(same percentile table over its query set).

Usage:
    python jobs/serving_latency.py [--pages 400000] [--k 50]
        [--repeats 3] [--modes preloaded,cold,distributed]
        [--workdir /tmp/serving_lat] [--cpus N]
Prints one JSON line; commit it under bench_raw/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def percentiles(lat_sec: list[float]) -> dict:
    s = sorted(lat_sec)
    return {
        "p50_ms": round(s[len(s) // 2] * 1000, 3),
        "p95_ms": round(s[int(len(s) * 0.95)] * 1000, 3),
        "p99_ms": round(s[int(len(s) * 0.99)] * 1000, 3),
        "mean_ms": round(sum(s) / len(s) * 1000, 3),
    }


def measure(search_fn, queries: list[str], k: int, repeats: int) -> dict:
    """min-of-repeats per query; wall/QPS from the best full sweep."""
    per_q: list[float] | None = None
    best_wall = float("inf")
    for _ in range(max(1, repeats)):
        lat = []
        t0 = time.time()
        for q in queries:
            t1 = time.time()
            search_fn(q, k)
            lat.append(time.time() - t1)
        best_wall = min(best_wall, time.time() - t0)
        per_q = (
            lat if per_q is None else [min(a, b) for a, b in zip(per_q, lat)]
        )
    out = percentiles(per_q)
    out["wall_sec"] = round(best_wall, 3)
    out["qps"] = round(len(queries) / best_wall, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", default="preloaded,cold,distributed")
    ap.add_argument(
        "--slow-limit",
        type=int,
        default=60,
        help="cap the query set for per-query-Spark-job modes "
        "(hybrid_spark / hybrid_ann); default 60 per the CLAUDE.md "
        "mandate (the uncapped 299x2 sweep ran >3.5 h in r6), pass 0 "
        "to explicitly opt into the full set.  Percentiles over a "
        "prefix stay representative (queries are i.i.d. in length); "
        "batch modes always sweep the full set so the speedup is "
        "apples-to-oranges by design — the batch row is the cure for "
        "exactly this per-query cost.",
    )
    ap.add_argument("--workdir", default="/tmp/serving_lat")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--shards", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO / "jobs"))
    from scaling import ensure_input  # same deterministic 400k corpus

    from lean_explore_spark.index.builder import IndexBuilder
    from lean_explore_spark.pyfiles import ensure_py_files
    from lean_explore_spark.query.search import SearchEngine
    from lean_explore_spark.session import get_spark

    # session + py-files zip FIRST: ensure_input's page generator runs
    # package code on executors (cwd-independent, unlike scaling.py
    # which relies on being launched from the repo root)
    spark = get_spark(
        app_name="serving_latency",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)

    work = Path(args.workdir)
    inp = work / f"pages_{args.pages}"
    ensure_input(args.pages, inp, spark=spark)

    idx = work / f"idx_{args.pages}"
    if not (idx / "stats.json").exists():
        IndexBuilder(
            spark, str(idx), num_shards=args.shards, num_buckets=16
        ).build(
            spark.read.parquet(str(inp)).select("doc_id", "text"),
            resume=False,
        )

    sys.path.insert(0, str(REPO))
    from bench import load_queries

    queries = load_queries()

    out = {
        "pages": args.pages,
        "k": args.k,
        "n_queries": len(queries),
        "repeats": args.repeats,
        "modes": {},
    }
    # ONE preloaded engine shared by every preload-flavored mode: the
    # 6.4M preload (postings collect into driver dicts) costs minutes,
    # and modes differ only in which search method they call (r8 — the
    # first 4-mode 6.4M run paid the preload three times)
    _shared_pre: list = []

    def preloaded_engine():
        if not _shared_pre:
            _shared_pre.append(SearchEngine(spark, str(idx), preload=True))
        return _shared_pre[0]

    for mode in args.modes.split(","):
        if mode == "preloaded":
            eng = preloaded_engine()
            fn = lambda q, k: eng.search(q, k)  # noqa: E731
        elif mode == "cold":
            eng = SearchEngine(spark, str(idx), preload=False)
            fn = lambda q, k: eng.search(q, k)  # noqa: E731
        elif mode == "distributed":
            eng = preloaded_engine()
            fn = lambda q, k: eng.search_distributed(q, k)  # noqa: E731
        elif mode == "auto":
            # r8 (VERDICT r7 #5): posting-mass routing — light queries
            # keep the sequential preloaded kernel, hot ones fan their
            # shards across threads (search_tokens_routed); targets
            # the 6.4M p95 tail without touching the 25 ms median
            eng = preloaded_engine()
            fn = lambda q, k: eng.search_routed(q, k)  # noqa: E731
        elif mode == "parallel":
            # the hot-path kernel unconditionally (threshold ablation)
            eng = preloaded_engine()
            fn = lambda q, k: eng.search_tokens_parallel(  # noqa: E731
                eng.analyze_query(q), k
            )
        elif mode.startswith("segmented"):
            # r6 (r5 VERDICT #2): serve a SEGMENTED index — base =
            # 7/8 of the corpus, 4 delta segments over the tail —
            # driver-side (segmented) or through the one-job
            # distributed batch (segmented_distributed_batch,
            # wall+QPS only).  Rank-identity vs the monolithic index
            # is the tests/test_streaming.py invariant; this row
            # measures what the segment fan-out costs at 400k.
            from lean_explore_spark.streaming import incremental as I

            seg_base = work / f"segroot_{args.pages}"
            if not (seg_base / "base" / "stats.json").exists():
                corpus = spark.read.parquet(str(inp)).select(
                    "doc_id", "text"
                )
                n_base = int(args.pages * 7 / 8)
                ids = corpus.select("doc_id").orderBy("doc_id")
                hi = ids.offset(n_base - 1).limit(1).collect()[0][0]
                IndexBuilder(
                    spark,
                    str(seg_base / "base"),
                    num_shards=args.shards,
                    num_buckets=16,
                ).build(corpus.where(f"doc_id <= {hi}"), resume=False)
                tail = (
                    corpus.where(f"doc_id > {hi}")
                    .orderBy("doc_id")
                    .collect()
                )
                step = -(-len(tail) // 4)
                for si in range(4):
                    rows = tail[si * step : (si + 1) * step]
                    if not rows:
                        continue
                    IndexBuilder(
                        spark,
                        str(seg_base / "segments" / f"seg={si}"),
                        num_shards=4,
                        num_buckets=16,
                    ).build(
                        spark.createDataFrame(
                            rows, "doc_id long, text string"
                        ),
                        resume=False,
                    )
                    I.register_segment(seg_base, f"seg={si}")
            seg = I.SegmentedSearch(spark, str(seg_base), preload=True)
            if mode == "segmented_ingest":
                # r7 (VERDICT r6 #6): query latency DURING live ingest
                # + tiered compaction.  The engine keeps its init-time
                # segment snapshot (manifest reads are lock-free —
                # only writers serialize on _manifest_lock), so this
                # row isolates CONTENTION: concurrent Spark jobs from
                # segment builds/merges, driver GIL pressure, and disk
                # traffic.  Runs on a hardlink COPY of the segment
                # root so the cached segroot stays pristine for the
                # plain `segmented` row.
                import shutil
                import threading

                from compaction_bench import build_segment

                scratch = work / f"segroot_ingest_{args.pages}"
                if scratch.exists():
                    shutil.rmtree(scratch)
                shutil.copytree(seg_base, scratch, copy_function=os.link)
                seg2 = I.SegmentedSearch(spark, str(scratch), preload=True)
                idle = measure(
                    lambda q, k: seg2.search(q, k),
                    queries, args.k, args.repeats,
                )
                ing_rows = (
                    spark.read.parquet(str(inp))
                    .select("doc_id", "text")
                    .orderBy("doc_id", ascending=False)
                    .limit(800)
                    .collect()
                )
                stop = threading.Event()
                stats = {"registered": 0, "compactions": 0}

                def churner():
                    xi = 0
                    while not stop.is_set():
                        # fresh doc_ids per segment (tiny integer shift
                        # of 2^62-scale hash ids — collision odds ~0,
                        # and the fold below must not see duplicates)
                        sdf = spark.createDataFrame(
                            [(r.doc_id + xi + 1, r.text) for r in ing_rows],
                            "doc_id long, text string",
                        )
                        name = f"seg=ing{xi}"
                        build_segment(
                            spark, sdf, scratch / "segments" / name, 2
                        )
                        I.register_segment(scratch, name)
                        stats["registered"] += 1
                        if xi % 2 == 1 and not stop.is_set():
                            I.compact_tiered(
                                spark, str(scratch), max_segments=4,
                                num_shards=4, num_buckets=16,
                            )
                            stats["compactions"] += 1
                        xi += 1

                th = threading.Thread(target=churner, daemon=True)
                th.start()
                under = measure(
                    lambda q, k: seg2.search(q, k),
                    queries, args.k, args.repeats,
                )
                stop.set()
                th.join()
                # every registration must be live or folded into a
                # merged segment — verified by doc count growth
                after = I.SegmentedSearch(spark, str(scratch), preload=True)
                assert after.n_docs == seg2.n_docs + 800 * stats[
                    "registered"
                ], (after.n_docs, seg2.n_docs, stats)
                out["modes"][mode] = {
                    "idle": idle,
                    "under_ingest": under,
                    **stats,
                }
                continue
            if mode == "segmented_distributed_batch":
                toks = [seg.engines[0].analyze_query(q) for q in queries]
                seg.search_tokens_distributed_batch(toks[:5], args.k)
                best = float("inf")
                for _ in range(max(1, args.repeats)):
                    t0 = time.time()
                    seg.search_tokens_distributed_batch(toks, args.k)
                    best = min(best, time.time() - t0)
                out["modes"][mode] = {
                    "wall_sec": round(best, 3),
                    "qps": round(len(queries) / best, 1),
                }
            else:
                out["modes"][mode] = measure(
                    lambda q, k: seg.search(q, k),
                    queries,
                    args.k,
                    args.repeats,
                )
            continue
        elif mode.startswith("hybrid"):
            # r5 VERDICT #6: the reference's rate benchmark measures
            # its FULL hybrid path (benchmark_search_rate.py:301-358),
            # not BM25 alone.  Modes: hybrid_driver (preloaded
            # embedding matrix), hybrid_spark (per-query table scan,
            # ~2 jobs/query), hybrid_ann (spark + 8 LSH probe tables),
            # hybrid_spark_batch / hybrid_ann_batch (the r6 batched
            # sweep — whole query set in ~2 jobs; wall+QPS only).
            from lean_explore_spark.query.service import SearchService

            emb_path = work / f"emb_{args.pages}"
            if not (emb_path / "_SUCCESS").exists():
                from lean_explore_spark.operators.embed import embed_texts

                embed_texts(
                    spark.read.parquet(str(inp)).select("doc_id", "text")
                ).write.mode("overwrite").parquet(str(emb_path))
            emb = spark.read.parquet(str(emb_path))
            meta = spark.read.parquet(str(inp)).select("doc_id", "lang")
            ann = 8 if "ann" in mode else 0
            emode = "driver" if mode == "hybrid_driver" else "spark"
            svc = SearchService(
                spark,
                str(idx),
                emb,
                doc_meta=meta,
                embedding_mode=emode,
                ann_tables=ann,
                preload=True,
            )
            if mode.endswith("_batch"):
                svc.batch_search(queries[:5], distributed=True)  # warm
                best = float("inf")
                for _ in range(max(1, args.repeats)):
                    t0 = time.time()
                    svc.batch_search(queries, distributed=True)
                    best = min(best, time.time() - t0)
                out["modes"][mode] = {
                    "wall_sec": round(best, 3),
                    "qps": round(len(queries) / best, 1),
                }
            else:
                qs = queries
                if args.slow_limit > 0 and mode in (
                    "hybrid_spark",
                    "hybrid_ann",
                ):
                    qs = queries[: args.slow_limit]
                row = measure(
                    lambda q, k: svc.search(q, limit=k),
                    qs,
                    args.k,
                    args.repeats,
                )
                row["n_queries"] = len(qs)
                out["modes"][mode] = row
            continue
        elif mode == "distributed_batch":
            # whole sweep in ONE Spark job (r5); per-query latency is
            # not meaningful here — report wall + QPS only
            eng = preloaded_engine()
            toks = [eng.analyze_query(q) for q in queries]
            eng.search_tokens_distributed_batch(toks[:5], args.k)  # warm
            best = float("inf")
            for _ in range(max(1, args.repeats)):
                t0 = time.time()
                eng.search_tokens_distributed_batch(toks, args.k)
                best = min(best, time.time() - t0)
            out["modes"][mode] = {
                "wall_sec": round(best, 3),
                "qps": round(len(queries) / best, 1),
            }
            continue
        else:
            raise ValueError(f"unknown mode {mode!r}")
        out["modes"][mode] = measure(fn, queries, args.k, args.repeats)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
