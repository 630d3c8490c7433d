"""MinHash near-dup family at scaling-corpus size (VERDICT r6 #5):
the span/repetition operators were measured at 3.2M docs in r6, but
the MinHash chain's largest prior measurement was the sf0.1 contract
corpus (5k docs).  This job times the at-scale composition —

    shingles (persisted, shared)          dedup.shingles
      → MinHash-LSH candidate pairs       dedup.minhash_candidate_pairs
      → exact-Jaccard refine              dedup.jaccard_refined_pairs
      → connected components → canonical  dedup.dup_clusters /
                                          dedup.canonicalize

— on the same deterministic pages corpus the scaling ladder uses.
Expected shape: pair generation is linear in corpus size (in-row
shingling, banded equi-join, never all-pairs); refine and clustering
are candidate-bounded.  Each stage is timed standalone over the shared
persisted shingle relation, so stage walls are comparable but NOT
additive with a single-chain run (refine re-derives its candidates —
noted in the output).

Usage:
    python jobs/dedup_bench.py [--pages 3200000] [--workdir /tmp/scaling]
        [--cpus N] [--shingle-n 3]
Prints one JSON line; commit it under bench_raw/.  Long run → tmux
(CLAUDE.md §Benchmarking).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "jobs"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=3_200_000)
    ap.add_argument("--workdir", default="/tmp/scaling")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument(
        "--dup-permille",
        type=int,
        default=20,
        help="inject near-duplicates: this fraction of docs (chosen by "
        "the deterministic md5-threshold sampler) is unioned back with "
        "a fresh doc_id and the last three words dropped (Jaccard "
        "~0.9) — the generated corpus itself has ~no near-dups, and "
        "refine/cluster/canonical should be measured doing real work; "
        "0 disables",
    )
    args = ap.parse_args()

    from scaling import ensure_input

    from lean_explore_spark.operators import dedup as D
    from lean_explore_spark.pyfiles import ensure_py_files
    from lean_explore_spark.session import get_spark

    spark = get_spark(
        app_name="dedup_bench",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)

    from pyspark import StorageLevel

    import pyspark.sql.functions as F

    work = Path(args.workdir)
    inp = work / f"pages_{args.pages}"
    ensure_input(args.pages, inp, spark=spark)
    docs = spark.read.parquet(str(inp)).select("doc_id", "text")
    n_docs = args.pages
    if args.dup_permille:
        from lean_explore_spark.operators.textstats import hash_sample

        dups = hash_sample(docs, args.dup_permille, salt="dupbench").select(
            # +1 on 2^62-scale hash ids: collision odds ~n^2/2^62 ≈ 0
            (F.col("doc_id") + 1).alias("doc_id"),
            F.regexp_replace(
                "text", r"(\s+\S+){3}$", ""
            ).alias("text"),
        )
        docs = docs.unionByName(dups)
        n_docs = args.pages + int(
            round(args.pages * args.dup_permille / 1000)
        )

    out = {
        "pages": args.pages,
        "dup_permille": args.dup_permille,
        "shingle_n": args.shingle_n,
        "stages": {},
    }

    def stage(name, fn):
        t0 = time.time()
        res = fn()
        wall = time.time() - t0
        out["stages"][name] = {
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall, 1),
            **res,
        }
        print(f"# {name}: {json.dumps(out['stages'][name])}", file=sys.stderr)

    # shared persisted shingle relation (the contract queries share it
    # the same way); disk-backed — ~240M rows at 3.2M docs
    sh = D.shingles(docs, args.shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stage("shingles", lambda: {"rows": sh.count()})

    stage(
        "minhash_pairs",
        lambda: {
            "candidate_pairs": D.minhash_candidate_pairs(
                docs, shingles_df=sh
            ).count()
        },
    )

    ref = D.jaccard_refined_pairs(docs, shingles_df=sh).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # NOTE: re-derives the banded candidates (stage walls are
    # standalone, not additive)
    stage("jaccard_refined", lambda: {"refined_pairs": ref.count()})

    pairs = ref.select("doc_a", "doc_b")
    stage(
        "dedup_clusters",
        lambda: {"cluster_rows": D.dup_clusters(pairs).count()},
    )
    stage(
        "dedup_canonical",
        lambda: {"surviving_docs": D.canonicalize(docs, pairs).count()},
    )
    ref.unpersist()
    sh.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
