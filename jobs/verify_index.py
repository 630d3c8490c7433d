"""Index fsck: recompute per-shard lineage from the postings actually
on disk and compare against the committed manifest (ops parity with
the reference's release integrity checks, scripts/release_data.py —
there the check is an md5 per uploaded artifact; here it is the
order-independent payload fingerprint per shard partition).

Usage: python jobs/verify_index.py --index /path/to/index [--cpus N]

Prints one JSON line: {"ok": bool, "shards": N, "mismatches": [...]}
Exit code 1 on any mismatch — wire into release pipelines.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from lean_explore_spark.session import get_spark  # noqa: E402


def verify(spark, index_dir: str) -> dict:
    root = Path(index_dir)
    manifest = (
        spark.read.parquet(str(root / "manifest"))
        .where(F.col("status") == "committed")
        .groupBy("shard")
        .agg(  # latest commit wins per shard (resume appends); ONE
            # max_by of a struct so all four fields come from the SAME
            # manifest row even on committed_at ties (same-second
            # commits from a crashed-then-resumed wave must not mix)
            F.max_by(
                F.struct("n_terms", "n_postings", "payload_bytes", "fingerprint"),
                "committed_at",
            ).alias("m"),
        )
        .select("shard", "m.n_terms", "m.n_postings", "m.payload_bytes", "m.fingerprint")
        .collect()
    )
    # recompute from payload bytes themselves (NOT the packer-emitted
    # fp column — an fsck must not trust the thing it checks)
    actual = (
        spark.read.parquet(str(root / "postings"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("df_shard").alias("n_postings"),
            F.sum(F.length("payload")).alias("payload_bytes"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(payload), 1, 15), 16, 10)"
                " as bigint))"
            ).alias("fingerprint"),
        )
        .collect()
    )
    want = {int(r["shard"]): r for r in manifest}
    got = {int(r["shard"]): r for r in actual}
    mismatches = []
    for shard in sorted(set(want) | set(got)):
        w, g = want.get(shard), got.get(shard)
        if w is None or g is None:
            mismatches.append({"shard": shard, "missing_in": "postings" if g is None else "manifest"})
            continue
        for fld in ("n_terms", "n_postings", "payload_bytes", "fingerprint"):
            if int(w[fld]) != int(g[fld]):
                mismatches.append(
                    {
                        "shard": shard,
                        "field": fld,
                        "manifest": int(w[fld]),
                        "actual": int(g[fld]),
                    }
                )
    return {"ok": not mismatches, "shards": len(got), "mismatches": mismatches}


def verify_segments(spark, index_root: str) -> dict:
    """Segment-root fsck (VERDICT r6 #8): run the per-shard payload-
    fingerprint check on EVERY manifest-live segment (each segment dir
    is a full index layout with its own commit manifest) plus the base
    index when present, and cross-check each segment's stats.json
    doc count against the forward store actually on disk.  The
    authority for which segments exist is segments/MANIFEST.json —
    never a seg=* glob (CLAUDE.md invariant); unregistered seg= dirs
    are reported informationally (out-of-band builds that never called
    register_segment), not failed.

    Returns {"ok": bool, "segments": N, "results": {name: {...}},
    "unregistered": [names]}; ok requires every live segment (and
    base) to pass."""
    from lean_explore_spark.streaming.incremental import live_segments

    root = Path(index_root)
    seg_root = root / "segments"
    live = live_segments(root)
    results: dict = {}
    for name in live:
        d = seg_root / name
        if not (d / "stats.json").exists():
            results[name] = {
                "ok": False,
                "error": "live segment missing on disk (or no stats.json)",
            }
            continue
        r = verify(spark, str(d))
        n_docs_stats = json.loads((d / "stats.json").read_text())["n_docs"]
        n_docs_fwd = spark.read.parquet(str(d / "forward")).count()
        if n_docs_fwd != n_docs_stats:
            r["ok"] = False
            r["mismatches"].append(
                {
                    "field": "n_docs",
                    "stats_json": int(n_docs_stats),
                    "forward": int(n_docs_fwd),
                }
            )
        results[name] = r
    if (root / "base" / "stats.json").exists():
        results["base"] = verify(spark, str(root / "base"))
    unregistered = (
        sorted(
            p.name
            for p in seg_root.iterdir()
            if p.is_dir()
            and p.name.startswith("seg=")
            and p.name not in set(live)
        )
        if seg_root.exists()
        else []
    )
    return {
        "ok": all(r.get("ok") for r in results.values()),
        "segments": len(live),
        "results": results,
        "unregistered": unregistered,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--segments",
        action="store_true",
        help="treat --index as a segmented index root: fsck every "
        "manifest-live segment (and base) instead of one monolithic "
        "index",
    )
    args = ap.parse_args()
    spark = get_spark(
        app_name="verify_index",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = (
        verify_segments(spark, args.index)
        if args.segments
        else verify(spark, args.index)
    )
    print(json.dumps(out))
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
