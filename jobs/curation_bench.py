"""r7 curation operators at scaling-corpus size: gopher_quality,
c4_quality, unigram_nll, and line_dedup re-run on the same
deterministic pages corpus the scaling ladder uses (r6 precedent: the
span/repetition family's 3.2M rows in BENCH.md §9).

Each stage forces real materialization (sums over the value columns —
a bare count() lets Catalyst prune whole subtrees; BENCH.md §9 note).

Usage:
    python jobs/curation_bench.py [--pages 3200000]
        [--workdir /tmp/scaling] [--cpus N]
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
    ap.add_argument(
        "--only", default=None,
        help="comma-separated stage names to run (default: all)",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from scaling import ensure_input

    import pyspark.sql.functions as F

    from lean_explore_spark.operators import dedup as D
    from lean_explore_spark.operators import mixing as MXS
    from lean_explore_spark.operators import textstats as T
    from lean_explore_spark.pyfiles import ensure_py_files
    from lean_explore_spark.session import get_spark

    spark = get_spark(
        app_name="curation_bench",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)

    work = Path(args.workdir)
    inp = work / f"pages_{args.pages}"
    ensure_input(args.pages, inp, spark=spark)
    docs = spark.read.parquet(str(inp)).select("doc_id", "text")

    out = {"pages": args.pages, "stages": {}}

    def stage(name, fn):
        if only is not None and name not in only:
            return
        t0 = time.time()
        res = fn()
        wall = time.time() - t0
        out["stages"][name] = {
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(args.pages / wall, 1),
            **res,
        }
        print(f"# {name}: {json.dumps(out['stages'][name])}", file=sys.stderr)

    def _pii():
        # the generated corpus carries no PII, so redactions are ~0 by
        # construction — the row measures the three-regex scan+rewrite
        # cost itself (clean-bytes sum forces the regexp_replace chain)
        from lean_explore_spark.operators import pii as P

        row = (
            P.scrub_pii(docs)
            .agg(
                F.sum(F.length("text")).alias("b"),
                F.sum(
                    F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")
                ).alias("r"),
            )
            .collect()[0]
        )
        return {"clean_bytes": int(row["b"]), "redactions": int(row["r"])}

    stage("pii_scrub", _pii)

    stage(
        "gopher_quality",
        lambda: {
            "passing_docs": int(
                T.gopher_quality(docs)
                .agg(F.sum("gopher_pass"))
                .collect()[0][0]
            )
        },
    )
    stage(
        "c4_quality",
        lambda: {
            "passing_docs": int(
                T.c4_quality(docs).agg(F.sum("c4_pass")).collect()[0][0]
            )
        },
    )
    stage(
        "unigram_nll",
        lambda: {
            "total_tokens": int(
                T.unigram_nll(docs).agg(F.sum("n_tokens")).collect()[0][0]
            )
        },
    )
    def _line_dedup():
        # sum of clean-text bytes forces the full rebuild (a bare
        # count would prune the collect_list — BENCH.md §9); ONE agg
        # action for both outputs
        row = (
            D.dedup_lines(docs)
            .agg(
                F.sum(F.length("clean_text")).alias("b"),
                F.sum("n_removed_lines").alias("r"),
            )
            .collect()[0]
        )
        return {"clean_bytes": int(row["b"]), "removed_lines": int(row["r"])}

    stage("line_dedup", _line_dedup)

    from lean_explore_spark.operators.textstats import hash_sample

    stage(
        "decontaminate",
        lambda: {
            # probe set = deterministic 0.5% sample standing in for an
            # eval suite; contaminated count forces the broadcast
            # semi-join + per-doc aggregation
            "contaminated_docs": int(
                D.decontaminate(docs, hash_sample(docs, 5, salt="cb"))
                .agg(F.sum("contaminated"))
                .collect()[0][0]
            )
        },
    )
    stage(
        "pack_sequences",
        lambda: {
            # max last_seq forces the full two-phase prefix sum
            "n_sequences": int(
                T.pack_sequences(docs, budget=4096)
                .agg(F.max("last_seq"))
                .collect()[0][0]
            )
            + 1
        },
    )

    def _line_dedup_doc():
        row = (
            D.dedup_lines(docs, scope="doc")
            .agg(
                F.sum(F.length("clean_text")).alias("b"),
                F.sum("n_removed_lines").alias("r"),
            )
            .collect()[0]
        )
        return {"clean_bytes": int(row["b"]), "removed_lines": int(row["r"])}

    stage("line_dedup_doc", _line_dedup_doc)

    def _classifier():
        # production shape: tiny labeled seeds (two disjoint 1%
        # hash-samples stand in for wiki-vs-crawl), the WHOLE corpus
        # scored through the broadcast weight table
        from lean_explore_spark.operators import classifier as CL

        pos = hash_sample(docs, 10, salt="clfpos")
        neg = hash_sample(docs, 10, salt="clfneg")
        w = CL.nb_logodds_weights(pos, neg)
        row = (
            CL.classifier_score(docs, w)
            .agg(
                F.sum("n_tokens").alias("t"),
                F.sum((F.col("clf_score") > 0).cast("long")).alias("p"),
            )
            .collect()[0]
        )
        return {"scored_tokens": int(row["t"]), "positive_docs": int(row["p"])}

    stage("classifier_score", _classifier)

    def _domain_mix():
        # language rebalancing: the corpus is ~75% en — equal weights
        # + a 100M-token budget downsample en hard and cap the rest
        from lean_explore_spark.operators import mixing as MX

        lang_docs = spark.read.parquet(str(inp)).select(
            "doc_id", "text", "lang"
        )
        kept = MX.domain_mix(
            lang_docs,
            {"en": 250_000, "de": 250_000, "zh": 250_000, "fr": 250_000},
            budget_tokens=100_000_000,
            domain_col="lang",
        )
        rows = (
            kept.groupBy("domain")
            .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
            .collect()
        )
        return {
            "kept_tokens": {r["domain"]: int(r["t"]) for r in rows},
            "kept_docs": int(sum(r["n"] for r in rows)),
        }

    stage("domain_mix", _domain_mix)

    stage(
        "shuffle_rank",
        lambda: {
            # max rank == n-1 proves the permutation is complete and
            # forces the two-phase rank end to end
            "max_rank": int(
                MXS.shuffle_rank(docs, shard_docs=65536)
                .agg(F.max("shuffle_rank"))
                .collect()[0][0]
            )
        },
    )

    stage(
        "length_quantiles",
        lambda: {
            "quantiles": {
                int(r["p_permille"]): int(r["q_tokens"])
                for r in T.length_quantiles(docs).collect()
            }
        },
    )

    def _bpe():
        # train (one histogram pass + driver merge loop) and encode
        # (broadcast ranks, narrow Arrow pass) timed separately
        from lean_explore_spark.operators import bpe as BP

        t0 = time.time()
        merges = BP.bpe_train(docs, n_merges=1000)
        train_wall = time.time() - t0
        row = (
            BP.bpe_token_counts(docs, merges)
            .agg(
                F.sum("n_words").alias("w"),
                F.sum("n_bpe_tokens").alias("t"),
            )
            .collect()[0]
        )
        return {
            "train_sec": round(train_wall, 1),
            "n_merges": len(merges),
            "words": int(row["w"]),
            "bpe_tokens": int(row["t"]),
        }

    stage("bpe", _bpe)

    def _novel():
        # incremental-crawl gate: a ~62k-doc new batch (copies of
        # every 101st doc + token-reversed every 103rd) vs the FULL
        # corpus as the existing side — the per-snapshot refresh shape
        from lean_explore_spark.operators import dedup as DD

        toks = F.expr(DD.SQL_TOKENS)
        new = (
            docs.where(F.expr("doc_id % 101 = 0"))
            .select((F.col("doc_id") + F.lit(10**10)).alias("doc_id"), "text")
            .unionAll(
                docs.where(F.expr("doc_id % 103 = 0")).select(
                    (F.col("doc_id") + F.lit(2 * 10**10)).alias("doc_id"),
                    F.array_join(F.reverse(toks), " ").alias("text"),
                )
            )
        )
        n_new = new.count()
        novel = DD.novel_docs(new, docs).count()
        return {"new_batch": int(n_new), "novel": int(novel)}

    stage("novel_docs", _novel)

    def _refresh_batch(DD):
        """The same deterministic refresh batch _novel uses: ~1% exact
        copies (re-idd) + ~1% reversed (novel) docs."""
        toks = F.expr(DD.SQL_TOKENS)
        return (
            docs.where(F.expr("doc_id % 101 = 0"))
            .select((F.col("doc_id") + F.lit(10**10)).alias("doc_id"), "text")
            .unionAll(
                docs.where(F.expr("doc_id % 103 = 0")).select(
                    (F.col("doc_id") + F.lit(2 * 10**10)).alias("doc_id"),
                    F.array_join(F.reverse(toks), " ").alias("text"),
                )
            )
        )

    def _novel_stored():
        """VERDICT r7 #2: the stored-artifact path.  One-time artifact
        write (the corpus-side cost, paid at build/segment time) timed
        separately from the RECURRING gate cost, which touches only
        the new batch + the two stored tables — never the corpus text."""
        import time as _t

        from lean_explore_spark.operators import dedup as DD

        art = work / f"near_dup_{args.pages}"
        t0 = _t.time()
        DD.write_near_dup_artifact(docs, str(art))
        write_sec = _t.time() - t0
        new = _refresh_batch(DD)
        n_new = new.count()
        t0 = _t.time()
        novel = DD.novel_docs_stored(new, str(art)).count()
        gate_sec = _t.time() - t0
        return {
            "artifact_write_sec": round(write_sec, 1),
            "new_batch": int(n_new),
            "novel": int(novel),
            "gate_sec": round(gate_sec, 1),
            "gate_docs_per_sec": round(n_new / gate_sec, 1),
        }

    stage("novel_docs_stored", _novel_stored)

    def _decontaminate_crafted():
        """VERDICT r7 #7: decontamination with a REALISTIC probe set —
        short eval-style questions, half of which embed a verbatim
        10-token span lifted from a corpus doc (true leakage), half
        fresh text that shares no 8-gram.  Measures hit-rate + wall at
        corpus scale; position-level hit semantics are pinned in
        tests/test_repetition_ops.py."""
        from lean_explore_spark.operators import dedup as DD

        toks = F.expr(DD.SQL_TOKENS)
        # leaked probes: a mid-doc 10-token span from ~1 in 1009 docs,
        # wrapped in question boilerplate (boilerplate words don't
        # extend the leaked gram run: they attach at both ends, and
        # 8-grams crossing the seam contain <8 corpus tokens)
        leaked = (
            docs.where(F.expr("doc_id % 1009 = 0"))
            .select(
                (F.col("doc_id") + F.lit(3 * 10**10)).alias("doc_id"),
                F.concat(
                    F.lit("question which passage states that "),
                    F.array_join(F.slice(toks, 5, 10), " "),
                    F.lit(" answer choices follow below"),
                ).alias("text"),
            )
            .where(F.size(toks) >= 14)
        )
        fresh = docs.where(F.expr("doc_id % 1013 = 0")).select(
            (F.col("doc_id") + F.lit(4 * 10**10)).alias("doc_id"),
            F.concat(
                F.lit("synthetic holdout item "),
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10),
                F.lit(" with entirely novel phrasing never present"),
            ).alias("text"),
        )
        probes = leaked.unionByName(fresh)
        n_probes = probes.count()
        res = DD.decontaminate(docs, probes)
        agg = res.agg(
            F.sum("contaminated").alias("hit_docs"),
            F.sum("hit_grams").alias("hit_grams"),
        ).collect()[0]
        return {
            "probes": int(n_probes),
            "contaminated_docs": int(agg["hit_docs"]),
            "hit_grams": int(agg["hit_grams"]),
        }

    stage("decontaminate_crafted", _decontaminate_crafted)

    def _span_cut(wide: bool):
        def run():
            cut = D.cut_dup_spans(docs, keep="first", wide_keys=wide)
            row = cut.agg(
                F.sum(F.length("clean_text")).alias("clean_chars"),
                F.sum("n_removed_tokens").alias("removed"),
                F.count("*").alias("docs"),
            ).collect()[0]
            return {
                "wide_keys": wide,
                "clean_chars": int(row["clean_chars"]),
                "removed_tokens": int(row["removed"]),
                "docs": int(row["docs"]),
            }

        return run

    # VERDICT r7 #8: the 120-bit two-bigint span key vs the default
    # 60-bit key — same results expected at this scale, measured
    # shuffle-width overhead.
    stage("span_cut_narrow", _span_cut(False))
    stage("span_cut_wide", _span_cut(True))

    def _host_stats():
        from lean_explore_spark.operators import webnorm as WN

        pages = spark.read.parquet(str(inp)).select("url", "lang", "text")
        rows = (
            WN.host_stats(pages)
            .agg(F.count("*").alias("h"), F.sum("n_pages").alias("p"))
            .collect()[0]
        )
        return {"hosts": int(rows["h"]), "pages": int(rows["p"])}

    stage("host_stats", _host_stats)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
