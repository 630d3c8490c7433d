"""Per-query isolation bench (guide §1.1/§1.4) — NOT the driver metric.

``bench.py`` is frozen (driver contract).  This harness exists for the
optimization loop: time a SUBSET of the declared queries in a fresh
process, with either the driver's ``.collect()`` (what the driver
times) or the noop sink (isolates computation from driver-side row
transfer), and optionally dump ``explain('formatted')`` per query.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries fingerprint,packed_ids [--mode collect|noop] \
      [--explain-dir plans/r09 --suffix _before] [--no-warmup]

Prints one JSON line {"sf_dir":..., "mode":..., "queries": {name: sec}}.
Run each A/B arm in its OWN process (CLAUDE.md: warm-JVM ordering bias).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="all",
                    help="comma list in run order, or 'all' (rotated order)")
    ap.add_argument("--mode", choices=["collect", "noop"], default="collect")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from lean_explore_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.no_warmup:
        from lean_explore_spark.operators.analyze import analyze
        analyze(
            spark.range(0, cpus * 4).selectExpr(
                "id as doc_id", "repeat('warm up the workers ', 8) as text"
            )
        ).count()

    reg = entrymod.queries()
    names = list(reg) if args.queries == "all" else args.queries.split(",")
    out: dict[str, float] = {}
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(name)
        # time fn() + action, like bench.py does (fn construction runs
        # driver-side loops for pagerank/dup_clusters/bpe and eager
        # checkpoints for pack_sequences — it belongs in the window)
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        if args.mode == "collect":
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        if args.explain_dir:
            p = Path(args.explain_dir)
            p.mkdir(parents=True, exist_ok=True)
            (p / f"{name}{args.suffix}.txt").write_text(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": args.sf_dir, "mode": args.mode,
                      "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
