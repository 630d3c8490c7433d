"""Per-round benchmark: ONE JSON line for the driver (BENCH_r{N}.json).

Measures, at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``:

* every driver-contract query (__spark_entry__.queries) wall time,
* inverted-index build throughput (docs/sec, tokens/sec),
* top-k WAND latency over the 299-query reference set
  (reference benchmarking/queries.txt when present, else a
  deterministic synthetic set) with preloaded assets — mirroring the
  reference harness semantics (benchmark_search_rate.py:260-358).

Headline ``value`` = index-build wall + 299-query wall, seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

REFERENCE_QUERIES = Path("/root/reference/benchmarking/queries.txt")


def load_queries() -> list[str]:
    if REFERENCE_QUERIES.exists():
        lines = [
            ln.strip()
            for ln in REFERENCE_QUERIES.read_text().splitlines()
            if ln.strip()
        ]
        if lines:
            return lines
    from lean_explore_spark.sources.pages import VOCAB

    return [
        " ".join(VOCAB[(7 * i + j) % len(VOCAB)] for j in range(2 + i % 4))
        for i in range(299)
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from lean_explore_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up executor threads + Python workers once so the
    # timed sections measure the pipeline, not JVM/worker cold start
    from lean_explore_spark.operators.analyze import analyze

    analyze(
        spark.range(0, cpus * 4).selectExpr(
            "id as doc_id", "repeat('warm up the workers ', 8) as text"
        )
    ).count()

    query_times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        query_times[name] = round(time.time() - t0, 3)

    # index build throughput
    from lean_explore_spark.index.builder import IndexBuilder
    from lean_explore_spark.query.search import SearchEngine

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    stats = IndexBuilder(
        spark, idx_dir, num_shards=8, num_buckets=8
    ).build(docs, resume=False)
    build_wall = time.time() - t0
    query_times["index_build"] = round(build_wall, 3)

    # 299-query top-k latency, preloaded assets
    engine = SearchEngine(spark, idx_dir, preload=True)
    qset = load_queries()
    lat: list[float] = []
    t_qs = time.time()
    for q in qset:
        t1 = time.time()
        engine.search(q, k=50)
        lat.append(time.time() - t1)
    query_wall = time.time() - t_qs
    lat.sort()
    query_times["wand_299_queries"] = round(query_wall, 3)
    p50 = lat[len(lat) // 2]
    p95 = lat[int(len(lat) * 0.95)]
    shutil.rmtree(idx_dir, ignore_errors=True)

    out = {
        "metric": "index_build_plus_299q_wall",
        "value": round(build_wall + query_wall, 3),
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "queries": query_times,
        "index_docs_per_sec": round(stats["n_docs"] / build_wall, 1),
        "index_tokens_per_sec": round(stats["total_tokens"] / build_wall, 1),
        "n_docs": stats["n_docs"],
        "query_p50_ms": round(p50 * 1000, 2),
        "query_p95_ms": round(p95 * 1000, 2),
        "qps": round(len(qset) / query_wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
