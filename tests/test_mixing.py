"""Training-set assembly ops (operators/mixing.py): domain-budget
mixing rates (hand-computed, cap, zero-weight, empty-domain,
overflow guard), hash-membership differential vs pure-Python md5,
shuffle_rank permutation identity across partitionings, shard math,
exact length quantiles vs a pure-Python inverse-CDF reference, and
the within-doc dedup_lines scope."""

from __future__ import annotations

import hashlib
import random
import re

import pyspark.sql.functions as F
import pytest

from lean_explore_spark.operators import dedup as D
from lean_explore_spark.operators import mixing as M
from lean_explore_spark.operators import textstats as T

PPM = 1_000_000
TOKRE = re.compile(r"\w+")


def fold15(salt: str, key) -> int:
    return int(
        hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


MIX_ROWS = [
    # src a: 3 docs x 4 tokens = 12 tokens
    (1, "a b c d", "a"),
    (2, "a b c d", "a"),
    (3, "a b c d", "a"),
    # src b: 2 docs x 2 tokens = 4 tokens
    (4, "x y", "b"),
    (5, "x y", "b"),
    # src c: empty domain (0 tokens, 1 doc)
    (6, "", "c"),
    # src d: unlisted -> dropped
    (7, "q r s", "d"),
]
WEIGHTS = {"a": 250_000, "b": 1_000_000, "c": 500_000}


def test_domain_rates_hand_computed(spark):
    got = {
        r["domain"]: (r["domain_tokens"], r["rate_ppm"])
        for r in M.domain_rates(
            _docs(spark, MIX_ROWS), WEIGHTS, budget_tokens=8
        ).collect()
    }
    # a: (8 * 250000) div 12 = 166666; b: (8 * 1e6) div 4 = 2e6 -> cap
    # c: 0 tokens -> keep whole; d: unlisted -> 0
    assert got == {
        "a": (12, 166_666),
        "b": (4, PPM),
        "c": (0, PPM),
        "d": (3, 0),
    }


def test_domain_rates_overflow_guard(spark):
    with pytest.raises(ValueError, match="overflows"):
        M.domain_rates(
            _docs(spark, MIX_ROWS), {"a": PPM}, budget_tokens=2**63
        )
    with pytest.raises(ValueError, match="weight out of"):
        M.domain_rates(_docs(spark, MIX_ROWS), {"a": PPM + 1}, 10)


def test_domain_mix_membership_matches_python(spark):
    out = {
        r["doc_id"]: (r["domain"], r["n_tokens"], r["rate_ppm"])
        for r in M.domain_mix(
            _docs(spark, MIX_ROWS), WEIGHTS, budget_tokens=8
        ).collect()
    }
    rates = {"a": 166_666, "b": PPM, "c": PPM, "d": 0}
    for doc_id, text, src in MIX_ROWS:
        keep = fold15("mix0", doc_id) % PPM < rates[src]
        assert (doc_id in out) == keep, (doc_id, src)
        if keep:
            assert out[doc_id] == (src, len(text.split()), rates[src])


def test_domain_mix_plan_is_broadcast(spark):
    df = M.domain_mix(_docs(spark, MIX_ROWS), WEIGHTS, budget_tokens=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shuffle_rank_is_expected_permutation(spark):
    ids = list(range(100, 400, 3))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    expect = {
        i: r
        for r, i in enumerate(
            sorted(ids, key=lambda i: (fold15("shuf0", i), i))
        )
    }
    for nparts in (1, 7):
        got = {
            r["doc_id"]: r["shuffle_rank"]
            for r in M.shuffle_rank(df.repartition(nparts)).collect()
        }
        assert got == expect, f"nparts={nparts}"


def test_shuffle_rank_shards_and_salts(spark):
    ids = list(range(50))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = M.shuffle_rank(df, shard_docs=8).collect()
    assert sorted(r["shuffle_rank"] for r in rows) == ids
    for r in rows:
        assert r["shard"] == r["shuffle_rank"] // 8
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in M.shuffle_rank(df, salt="shuf1").collect()
    }
    base = {r["doc_id"]: r["shuffle_rank"] for r in rows}
    assert other != base  # independent permutation per salt


def py_quantiles(lengths, ps):
    n = len(lengths)
    s = sorted(lengths)
    out = {}
    for p in ps:
        t = -((-p * n) // 1000)  # ceil(p*n/1000)
        out[p] = s[t - 1]
    return out


def test_length_quantiles_crafted(spark):
    texts = ["a", "a b", "a b c", "a b c d", "a b c d e"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["p_permille"]: r["q_tokens"]
        for r in T.length_quantiles(df, (200, 500, 900, 1000)).collect()
    }
    assert got == {200: 1, 500: 3, 900: 5, 1000: 5}


def test_length_quantiles_random_differential(spark):
    rng = random.Random(7)
    lengths = [rng.randint(0, 40) for _ in range(500)]
    texts = [" ".join(["w"] * n) for n in lengths]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    ps = (10, 250, 500, 750, 990, 1000)
    got = {
        r["p_permille"]: r["q_tokens"]
        for r in T.length_quantiles(df, ps).collect()
    }
    assert got == py_quantiles(lengths, ps)


def test_length_quantiles_validates_p(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.length_quantiles(df, (0,))
    with pytest.raises(ValueError):
        T.length_quantiles(df, (1001,))


# --- dedup_lines(scope="doc") — FineWeb intra-doc cleanup ---

DOC_ROWS = [
    (1, "nav\nbody one\nnav\ntail"),   # nav repeats WITHIN doc 1
    (2, "nav\nbody two"),              # same line, other doc: untouched
    (3, "x\nx\nx"),                    # triple self-repeat
]


def test_dedup_lines_doc_scope_keep_first(spark):
    df = spark.createDataFrame(DOC_ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_lines"])
        for r in D.dedup_lines(df, scope="doc").collect()
    }
    assert got == {
        1: ("nav\nbody one\ntail", 1),
        2: ("nav\nbody two", 0),  # cross-doc copy survives in doc scope
        3: ("x", 2),
    }


def test_dedup_lines_doc_scope_keep_none(spark):
    df = spark.createDataFrame(DOC_ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in D.dedup_lines(df, keep="none", scope="doc").collect()
    }
    assert got == {1: "body one\ntail", 2: "nav\nbody two", 3: ""}


def test_dedup_lines_corpus_scope_unchanged(spark):
    # regression pin: the corpus-scope contract behavior is intact
    df = spark.createDataFrame(DOC_ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in D.dedup_lines(df).collect()
    }
    assert got == {1: "nav\nbody one\ntail", 2: "body two", 3: "x"}


def test_dedup_lines_scope_validation(spark):
    df = spark.createDataFrame(DOC_ROWS, "doc_id long, text string")
    with pytest.raises(ValueError, match="scope"):
        D.dedup_lines(df, scope="paragraph")


def test_shuffle_rank_keep_cols(spark):
    rows = [(i, f"t{i}", "en") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = M.shuffle_rank(df, shard_docs=8, keep_cols=True)
    assert out.columns == ["doc_id", "text", "lang", "shuffle_rank", "shard"]
    got = {r["doc_id"]: r for r in out.collect()}
    base = {
        r["doc_id"]: r["shuffle_rank"]
        for r in M.shuffle_rank(df).collect()
    }
    for i, t, lg in rows:
        assert got[i]["shuffle_rank"] == base[i]  # same permutation
        assert (got[i]["text"], got[i]["lang"]) == (t, lg)

    with pytest.raises(ValueError, match="reserved"):
        M.shuffle_rank(df.withColumn("_b", F.lit(1)), keep_cols=True)
    with pytest.raises(ValueError, match="bucket_bits"):
        M.shuffle_rank(df, bucket_bits=0)


# --- chunk_passages (retrieval passage prep) ---

def py_chunks(text, size, stride):
    toks = TOKRE.findall(text.lower())
    out = []
    for no, s in enumerate(range(0, len(toks), stride)):
        out.append((no, s, min(size, len(toks) - s),
                    " ".join(toks[s:s + size])))
    return out


def test_chunk_passages_crafted(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")],
        "doc_id long, text string",
    )
    got = {}
    for r in T.chunk_passages(df, size=3, stride=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["passage_no"], r["start_tok"], r["n_tokens"], r["passage"])
        )
    assert sorted(got[1]) == [(0, 0, 3, "a b c"), (1, 2, 3, "c d e"),
                              (2, 4, 1, "e")]
    assert 2 not in got          # zero-token docs emit nothing
    assert sorted(got[3]) == [(0, 0, 1, "x")]


def test_chunk_passages_random_differential(spark):
    rng = random.Random(21)
    texts = [
        " ".join(f"w{rng.randint(0, 30)}" for _ in range(rng.randint(0, 90)))
        for _ in range(80)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {}
    for r in T.chunk_passages(df, size=16, stride=7).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["passage_no"], r["start_tok"], r["n_tokens"], r["passage"])
        )
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == py_chunks(t, 16, 7), i


def test_chunk_passages_validates(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.chunk_passages(df, size=0)
    with pytest.raises(ValueError):
        T.chunk_passages(df, stride=0)


def test_chunk_passages_plan_single_exchange(spark):
    """COVERAGE claim: one explicit-count repartition, then per-row."""
    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    plan = (
        T.chunk_passages(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan
