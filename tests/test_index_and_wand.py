"""Index build + block-max WAND: bit-exact rank-identity vs the numpy
oracle (SURVEY.md §5 plan #2/#4/#5), plus resume/checkpoint tests."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from lean_explore_spark.functions.tokenizer import tokenize_stem
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.oracle import bm25 as oracle
from lean_explore_spark.query.search import SearchEngine
from tests.conftest import SF_ORACLE

QUERIES = [
    "fast table scan merge join",
    "customer orders data",
    "spark streaming window",
    "group group group",
    "nonexistentterm",
    "the",
    "slow query batch value row",
    "",
    "scan scan filter the a an window sort key",
]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("idx") / "sf001"
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    IndexBuilder(
        spark, str(out), stem=True, num_shards=4, num_buckets=4, block_size=32
    ).build(docs, resume=False)
    return str(out)


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return SearchEngine(spark, index_dir, preload=True)


@pytest.fixture(scope="module")
def ostats():
    rows = duckdb.sql(
        f"select doc_id, text from '{SF_ORACLE}/documents.parquet' order by doc_id"
    ).fetchall()
    return oracle.build_stats(
        [r[0] for r in rows], (tokenize_stem(r[1]) for r in rows)
    )


@pytest.mark.parametrize("mode", ["wand", "bulk", "blockmax"])
@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [5, 25])
def test_wand_bit_exact_vs_oracle(engine, ostats, query, k, mode):
    tokens = tokenize_stem(query)
    got = engine.search_tokens(tokens, k, mode=mode)
    want = oracle.top_k(ostats, tokens, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == ws, f"doc {gd}: {gs!r} != {ws!r} (bit-exact required)"


def test_k_larger_than_matched(engine, ostats):
    # rare-ish multi-term query with k exceeding matched docs exercises
    # the delta-floor fill path
    tokens = ["zzz_not_in_corpus"]
    got = engine.search_tokens(tokens, 10)
    want = oracle.top_k(ostats, tokens, 10)
    assert got == [(d, s) for d, s in want]


def test_index_stats_match_oracle(engine, ostats):
    assert engine.n_docs == ostats.n_docs
    assert engine.avgdl == pytest.approx(ostats.avgdl, rel=0, abs=0)


def test_dictionary_df_matches_oracle(spark, index_dir, ostats):
    rows = spark.read.parquet(f"{index_dir}/dictionary").collect()
    got = {r["term"]: r["df"] for r in rows}
    want = {t: len(m) for t, m in ostats.postings.items()}
    assert got == want


def test_resume_reproduces_identical_index(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")

    full = tmp_path / "full"
    IndexBuilder(spark, str(full), num_shards=4, num_buckets=4).build(
        docs, resume=False
    )

    # simulate a kill after 2 of 4 shards
    part = tmp_path / "part"
    b = IndexBuilder(spark, str(part), num_shards=4, num_buckets=4)
    part.mkdir(parents=True, exist_ok=True)
    info = b.write_staging(docs)
    stats = b.write_doc_stats(info)
    for shard in (0, 1):
        b._append_manifest([b.pack_shard(shard, avgdl=stats["avgdl"])])
    # resume must pack only shards 2,3 and converge to the same index
    b.build(docs, resume=True)

    def fingerprint(d):
        return (
            spark.read.parquet(f"{d}/postings")
            .groupBy("shard")
            .agg(
                __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                    "bit_xor(cast(conv(substring(md5(payload),1,15),16,10) as bigint))"
                ).alias("fp"),
            )
            .orderBy("shard")
            .collect()
        )

    assert [tuple(r) for r in fingerprint(full)] == [
        tuple(r) for r in fingerprint(part)
    ]
    # manifest has exactly one committed row per shard
    m = spark.read.parquet(str(part / "manifest")).collect()
    assert sorted(r["shard"] for r in m) == [0, 1, 2, 3]


def test_vectorized_packer_rows_equal_reference_pack(spark, tmp_path):
    """Every (term, shard) row the vectorized mapInArrow packer emits
    must byte-equal codec.pack_postings applied to the same posting run
    (ids/tfs from the forward index, ranks/doc-lens from doc_stats) —
    the packer re-derives blocks/gaps/metadata with reduceat tricks, so
    pin it to the reference implementation."""
    import json

    import numpy as np
    import pyspark.sql.functions as F

    from lean_explore_spark.index import codec
    from lean_explore_spark.sources import pages as P

    docs = P.assign_doc_ids(
        P.extract_text(P.generate_pages(spark, 300, partitions=3))
    ).select("doc_id", F.col("extracted_text").alias("text"))
    out = tmp_path / "packref"
    IndexBuilder(spark, str(out), num_shards=3, num_buckets=4).build(
        docs, resume=False
    )
    stats = json.loads((out / "stats.json").read_text())
    span = stats["span"]

    # ground truth postings from the docs themselves
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    postings: dict = {}
    doc_len: dict = {}
    for r in rows:
        toks = tokenize_stem(r["text"])
        doc_len[r["doc_id"]] = len(toks)
        freqs: dict = {}
        for t in toks:
            freqs[t] = freqs.get(t, 0) + 1
        for t, tf in freqs.items():
            postings.setdefault((t, r["doc_id"] // span), []).append(
                (r["doc_id"], tf)
            )

    by_shard_ids = {}
    for d in doc_len:
        by_shard_ids.setdefault(d // span, []).append(d)
    for s in by_shard_ids:
        by_shard_ids[s] = np.array(sorted(by_shard_ids[s]), dtype=np.int64)

    packed_rows = spark.read.parquet(str(out / "postings")).collect()
    assert len(packed_rows) == len(postings)
    for row in packed_rows:
        key = (row["term"], int(row["shard"]))
        plist = sorted(postings[key])
        ids = np.array([d for d, _ in plist], dtype=np.int64)
        tfs = np.array([f for _, f in plist], dtype=np.int64)
        dl_ids = by_shard_ids[key[1]]
        ranks = np.searchsorted(dl_ids, ids)
        dls = np.array([doc_len[int(d)] for d in ids], dtype=np.int64)
        want = codec.pack_postings(
            ids, tfs, dls, avgdl=stats["avgdl"],
            block_size=stats["block_size"], ranks=ranks,
        )
        assert bytes(row["payload"]) == want.payload, key
        assert list(row["block_first"]) == want.block_first.tolist()
        assert list(row["block_last"]) == want.block_last.tolist()
        assert list(row["block_count"]) == want.block_count.tolist()
        assert list(row["block_gap_bytes"]) == want.block_gap_bytes.tolist()
        assert list(row["block_tf_bytes"]) == want.block_tf_bytes.tolist()
        assert list(row["block_max_score"]) == want.block_max_score.tolist()
        assert list(row["block_max_tf"]) == want.block_max_tf.tolist()
        assert int(row["df_shard"]) == want.count


def test_verify_index_fsck(spark, index_dir, tmp_path):
    """jobs/verify_index recomputes per-shard lineage from payload
    bytes and matches the manifest; a corrupted payload is caught."""
    import shutil
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from verify_index import verify

    out = verify(spark, index_dir)
    assert out["ok"] and not out["mismatches"]

    # corrupt one postings file → fsck must flag its shard
    broken = tmp_path / "broken_idx"
    shutil.copytree(index_dir, broken)
    victim = next((broken / "postings").rglob("*.parquet"))
    import pyarrow.parquet as pq
    import pyarrow as pa

    tbl = pq.read_table(victim)
    payloads = tbl.column("payload").to_pylist()
    payloads[0] = (payloads[0] or b"") + b"\x00"
    tbl = tbl.set_column(
        tbl.schema.get_field_index("payload"), "payload",
        pa.array(payloads, type=pa.binary()),
    )
    pq.write_table(tbl, victim)
    # drop Hadoop's CRC sidecar — it would catch the rewrite before
    # the fsck logic under test ever runs
    crc = victim.parent / f".{victim.name}.crc"
    if crc.exists():
        crc.unlink()
    out2 = verify(spark, str(broken))
    assert not out2["ok"] and out2["mismatches"]


def test_rebuild_same_path_invalidates_worker_cache(spark, tmp_path):
    """ADVICE r2 (medium): python workers persist across jobs, so a
    rebuild at the SAME path with a different corpus must not serve the
    previous build's doc-id/doc-len slices to the packer (the cache key
    carries a build-unique stats.json token).  Before the fix, the
    second build's gaps were computed against the FIRST build's doc-id
    ranks → decoded doc ids diverge from the oracle."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = tmp_path / "same_path"

    IndexBuilder(spark, str(out), stem=True, num_shards=4, num_buckets=4).build(
        docs, resume=False
    )
    # prime the worker caches with build #1's slices
    SearchEngine(spark, str(out)).search("customer orders data", 10)

    # build #2: same path, different corpus (subset → different doc-id
    # universe, different span, same shard numbers / doc_stats root)
    docs2 = docs.where("doc_id % 3 != 0")
    IndexBuilder(spark, str(out), stem=True, num_shards=4, num_buckets=4).build(
        docs2, resume=False
    )

    import duckdb

    rows = duckdb.sql(
        f"select doc_id, text from '{SF_ORACLE}/documents.parquet' "
        "where doc_id % 3 != 0 order by doc_id"
    ).fetchall()
    ostats = oracle.build_stats(
        [r[0] for r in rows], (tokenize_stem(r[1]) for r in rows)
    )
    eng = SearchEngine(spark, str(out), preload=True)
    for q in ["customer orders data", "fast table scan merge join"]:
        toks = tokenize_stem(q)
        got = eng.search_tokens(toks, 25)
        want = oracle.top_k(ostats, toks, 25)
        assert got == [(d, s) for d, s in want], q


def test_delta_floor_fill_reads_shard_prefix_only(spark, index_dir):
    """r2 VERDICT #2: the delta-floor fill is shard-lazy — a sub-k
    rare-term query consumes ids from the first doc-range shard(s)
    only, never collecting the corpus id universe to the driver."""
    eng = SearchEngine(spark, index_dir, preload=False)
    got = eng.search_tokens(["zzz_not_in_corpus"], 5)
    assert len(got) == 5 and all(s == got[0][1] for _, s in got)
    shards = eng._shards()
    assert len(shards) > 1
    # only the first shard's doc_stats slice was loaded
    assert set(eng._dl_cache) == {shards[0]}


def test_cold_mode_dl_cache_is_lru_bounded(spark, index_dir, ostats):
    """r3 VERDICT #2: a cold engine that touches every shard holds at
    most N cached doc-length slices (LRU), and the bound never changes
    scores; preload mode still pins everything."""
    eng = SearchEngine(spark, index_dir, preload=False, dl_cache_shards=2)
    shards = eng._shards()
    assert len(shards) >= 3
    for s in shards:
        eng._doc_lens(s)
        assert len(eng._dl_cache) <= 2
    assert set(eng._dl_cache) == set(shards[-2:])  # LRU keeps the tail
    for q in ["customer orders data", "the"]:
        toks = tokenize_stem(q)
        want = [(d, s) for d, s in oracle.top_k(ostats, toks, 25)]
        assert eng.search_tokens(toks, 25) == want
        assert len(eng._dl_cache) <= 2
    pre = SearchEngine(spark, index_dir, preload=True)
    assert len(pre._dl_cache) == len(shards)  # pinned, not bounded
