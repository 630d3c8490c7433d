"""Scaling-efficiency evidence: same indexing job at local[N] and
local[4N] on identical input (north_rule: ≥0.8 throughput scaling
efficiency from N to 4N executors; evidenced in-sandbox per BASELINE.md
by two parallelism levels on one machine).

Each run is a fresh ``spark-submit``-equivalent subprocess (own JVM,
own session) via jobs/build_index_job.py; the input is a deterministic
pages corpus written once.  Also asserts the two runs produce
bit-identical posting payload fingerprints — index determinism across
cluster sizes (SURVEY.md §5 test plan #4).

Usage: python jobs/scaling.py [--pages 50000] [--n 8] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def ensure_input(n_pages: int, path: Path, spark=None) -> None:
    if (path / "_SUCCESS").exists():
        return
    from lean_explore_spark.session import get_spark
    from lean_explore_spark.sources import pages as P

    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="gen_pages")
    spark.sparkContext.setLogLevel("ERROR")
    df = P.assign_doc_ids(
        P.extract_text(P.generate_pages(spark, n_pages, partitions=64))
    )
    (
        df.select("doc_id", df["extracted_text"].alias("text"), "lang", "url")
        .write.mode("overwrite")
        .parquet(str(path))
    )
    if own_session:  # callers passing a session keep using it
        spark.stop()


def run_build(
    input_path: Path, out: Path, cpus: int, shards: int, pin: bool = False
) -> dict:
    cmd = [
        sys.executable,
        str(REPO / "jobs" / "build_index_job.py"),
        "--input",
        str(input_path),
        "--output",
        str(out),
        "--shards",
        str(shards),
        "--buckets",
        "16",
        "--cpus",
        str(cpus),
    ]
    if pin:
        # pin the whole process tree (JVM + Python workers) to exactly
        # `cpus` cores: an unpinned local[2] JVM on a 32-core box lets
        # GC/JIT/netty helper threads spill onto free cores — a subsidy
        # a real 2-executor cluster never gets, which deflates the
        # measured N→4N efficiency.  Pinning models "N executor cores
        # vs 4N executor cores" faithfully (BENCH.md §1).
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = proc.stdout.strip().splitlines()[-1]
    res = json.loads(line)
    res["subprocess_wall"] = round(time.time() - t0, 1)
    return res


def fingerprints(index_dir: Path) -> list[tuple]:
    from lean_explore_spark.session import get_spark

    spark = get_spark(app_name="fp")
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        spark.read.parquet(str(index_dir / "manifest"))
        .orderBy("shard")
        .select("shard", "n_terms", "n_postings", "payload_bytes", "fingerprint")
        .collect()
    )
    return [tuple(r) for r in rows]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=50_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism N")
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--workdir", default="/tmp/scaling")
    ap.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="runs per parallelism level; best (min wall) wins — the "
        "standard robust estimator on a noisy shared VM",
    )
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset each run to exactly its CPU budget (faithful "
        "N-vs-4N-executor model; see run_build)",
    )
    args = ap.parse_args()

    work = Path(args.workdir)
    inp = work / "pages_input"
    ensure_input(args.pages, inp)

    import shutil

    results = {}
    for cpus, tag in ((args.n, "N"), (args.n * 4, "4N")):
        out = work / f"idx_c{cpus}"
        best = None
        for _ in range(max(1, args.repeats)):
            shutil.rmtree(out, ignore_errors=True)
            r = run_build(inp, out, cpus, args.shards, pin=args.pin)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        results[tag] = best
        results[tag]["cpus"] = cpus

    tn = results["N"]["docs_per_sec"]
    t4n = results["4N"]["docs_per_sec"]
    eff = t4n / (4 * tn)

    fp_n = fingerprints(work / f"idx_c{args.n}")
    fp_4n = fingerprints(work / f"idx_c{args.n * 4}")
    identical = fp_n == fp_4n

    summary = {
        "pages": args.pages,
        "pinned": args.pin,
        "N_cpus": args.n,
        "throughput_N_docs_per_sec": tn,
        "throughput_4N_docs_per_sec": t4n,
        "scaling_efficiency": round(eff, 3),
        "meets_0_8": eff >= 0.8,
        "index_identical_across_parallelism": identical,
        "runs": results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
