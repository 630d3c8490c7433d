"""End-to-end training-data pipeline over the documents table — the
composition story for 100 TB: every stage is one of the repo's
oracle-checked operators, chained as a single lazy DataFrame flow plus
the index build at the end.

    raw documents
      → language ID                      (textstats.lang_id)
      → quality filter (per-lang top-X%) (textstats.quality_topk_per_group)
      → exact dedup                      (dedup.exact_dup_groups winners)
      → near-dup: MinHash-LSH candidates → exact-Jaccard refine
                  → connected components → canonical selection
                                         (dedup.jaccard_refined_pairs,
                                          dup_clusters, canonicalize)
      → stratified hash sampling         (textstats.stratified_hash_sample)
      → inverted-index build             (index.builder.IndexBuilder)

Usage:
    python jobs/pipeline_demo.py [--input DIR/documents.parquet]
                                 [--out /tmp/pipeline_idx] [--cpus N]

Prints one JSON line with per-stage row counts and the final index
stats — the shape a production run would emit to its run ledger.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402


def run_pipeline(
    spark,
    docs,
    out_dir: str,
    quality_k: int = 1_000_000_000,
    sample_rates: dict | None = None,
    default_permille: int = 1000,
    num_shards: int = 8,
    num_buckets: int = 8,
) -> dict:
    from lean_explore_spark.index.builder import IndexBuilder
    from lean_explore_spark.operators import dedup as D
    from lean_explore_spark.operators import textstats as T

    counts = {"input": docs.count()}

    # 1. language ID (broadcast stopword join; replaces the raw lang
    # column with the model's prediction, as a real pipeline would)
    lang = T.lang_id(docs).select(
        "doc_id", F.col("pred_lang").alias("lang")
    )
    docs = docs.drop("lang").join(lang, "doc_id")

    # 2. per-language quality top-k — actually skipped when k covers
    # every doc (ADVICE r3: the guard used to be a comment only, and
    # the default config paid a corpus-wide window + join for nothing)
    if quality_k < counts["input"]:
        kept = T.quality_topk_per_group(docs, k=quality_k).select("doc_id")
        docs = docs.join(kept, "doc_id")
    counts["after_quality"] = docs.count()

    # 3. exact dedup: keep first-writer canonical per content hash
    winners = D.exact_dup_groups(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    docs = docs.join(winners, "doc_id")
    counts["after_exact_dedup"] = docs.count()

    # 4. near-dup: LSH candidates → exact refine → components →
    # canonical member per component
    pairs = D.jaccard_refined_pairs(docs).select("doc_a", "doc_b")
    docs = D.canonicalize(docs, pairs)
    counts["after_near_dedup"] = docs.count()

    # 5. stratified sampling (per-language rebalance)
    docs = T.stratified_hash_sample(
        docs,
        sample_rates or {},
        default_permille=default_permille,
    )
    counts["after_sampling"] = docs.count()

    # 6. index build over the cleaned corpus
    t0 = time.time()
    stats = IndexBuilder(
        spark,
        out_dir,
        stem=True,
        num_shards=num_shards,
        num_buckets=num_buckets,
    ).build(docs.select("doc_id", "text"), resume=False)
    return {
        "counts": counts,
        "index": {
            "n_docs": stats["n_docs"],
            "total_tokens": stats["total_tokens"],
            "build_sec": round(time.time() - t0, 2),
        },
        "out": out_dir,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", default="/root/testdata/sf0.01/documents.parquet"
    )
    ap.add_argument("--out", default="/tmp/pipeline_idx")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--quality-k", type=int, default=1_000_000_000)
    args = ap.parse_args()

    from lean_explore_spark.session import get_spark

    spark = get_spark(
        app_name="pipeline_demo",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.input)
    out = run_pipeline(spark, docs, args.out, quality_k=args.quality_k)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
