"""Materialized BPE token packing (VERDICT r7 #4): bpe_encode_ids +
pack_token_ids — the opt-in final stages that turn shuffled raw-text
shards into fixed-length packed token sequences."""

from __future__ import annotations

import pytest

from lean_explore_spark.operators import bpe as B
from lean_explore_spark.operators import textstats as T


def test_vocab_deterministic_and_encode_ids_roundtrip(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "the the the"),
        (3, ""),
        (4, "concatenation station nation"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges, vocab = B.bpe_train_full(df, n_merges=20)
    # ids: alphabet block first (sorted), merge products appended in order
    alpha = sorted({c for _, t in texts for w in t.split() for c in w}
                   | {B.EOW})
    assert [s for s, _ in sorted(vocab.items(), key=lambda kv: kv[1])][
        : len(alpha)
    ] == alpha
    for i, (a, b) in enumerate(merges):
        assert vocab[a + b] >= len(alpha)
    inv = {i: s for s, i in vocab.items()}
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], list(r["token_ids"]))
        for r in B.bpe_encode_ids(df, merges, vocab).collect()
    }
    for doc_id, text in texts:
        want_syms = [
            s for w in text.lower().split() for s in B.encode_word(w, ranks)
        ]
        n, ids = got[doc_id]
        assert n == len(ids) == len(want_syms)
        assert [inv[i] for i in ids] == want_syms


def _encoded(spark, rows):
    # (doc_id, n, token_ids) with explicit id arrays
    return spark.createDataFrame(
        [(d, len(ids), ids) for d, ids in rows],
        "doc_id long, n_tokens long, token_ids array<int>",
    )


def test_pack_token_ids_hand_example(spark):
    # stream in doc_id order: [1..4] + [5..13] + [] + [14] = 14 ids;
    # budget 5 -> seqs [1..5][6..10][11..14]
    enc = _encoded(spark, [
        (10, [1, 2, 3, 4]),
        (20, [5, 6, 7, 8, 9, 10, 11, 12, 13]),
        (30, []),
        (40, [14]),
    ])
    got = {
        r["seq_id"]: (r["n_tokens"], list(r["token_ids"]))
        for r in T.pack_token_ids(enc, budget=5).collect()
    }
    assert got == {
        0: (5, [1, 2, 3, 4, 5]),
        1: (5, [6, 7, 8, 9, 10]),
        2: (4, [11, 12, 13, 14]),
    }


def test_pack_token_ids_conservation_random(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.randrange(1000) for _ in range(rng.randrange(0, 40))])
        for i in range(1, 301)
    ]
    budget = 16
    enc = _encoded(spark, rows)
    seqs = sorted(
        (r["seq_id"], list(r["token_ids"]))
        for r in T.pack_token_ids(enc, budget=budget).collect()
    )
    stream = [x for _, ids in sorted(rows) for x in ids]
    # exact chunking of the doc-order concatenated stream
    want = [
        (s, stream[s * budget:(s + 1) * budget])
        for s in range((len(stream) + budget - 1) // budget)
    ]
    assert seqs == want
    # conservation + fixed sizes
    assert sum(len(ids) for _, ids in seqs) == len(stream)
    assert all(len(ids) == budget for _, ids in seqs[:-1])


def test_pack_token_ids_order_col_rank(spark):
    # packing in shuffled order: the order key is a value rank
    enc = spark.createDataFrame(
        [(100, 0, 2, [1, 2]), (200, 1, 2, [3, 4])],
        "doc_id long, rank long, n long, token_ids array<int>",
    ).select("rank", "n", "token_ids")
    got = {
        r["seq_id"]: list(r["token_ids"])
        for r in T.pack_token_ids(enc, budget=3, order_col="rank").collect()
    }
    assert got == {0: [1, 2, 3], 1: [4]}
