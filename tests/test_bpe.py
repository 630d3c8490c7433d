"""BPE tokenizer (operators/bpe.py): hand-computed merge sequences,
an indexed-vs-naive trainer differential on seeded random histograms,
greedy encode semantics, end-to-end Spark token counts vs pure
Python, determinism across partitionings, and the histogram cap."""

from __future__ import annotations

import random
import re

from lean_explore_spark.operators import bpe as B

TOK = re.compile(r"\w+")


def naive_train(histogram, n_merges):
    """Independent reference: recount every pair from scratch each
    iteration (O(n_merges × histogram) — fine at test size)."""
    words = {i: list(w) + [B.EOW] for i, (w, _) in enumerate(histogram)}
    counts = {i: c for i, (_, c) in enumerate(histogram)}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + counts[i]
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        if pc[best] <= 0:
            break
        merges.append(best)
        a, b = best
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def py_encode_counts(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    words = TOK.findall(text.lower())
    return len(words), sum(len(B.encode_word(w, ranks)) for w in words)


def test_train_merges_hand_computed():
    # "aaab" x3, "aab" x2: pairs (a,a)=3+3+2=8 dominate
    hist = [("aaab", 3), ("aab", 2)]
    merges = B.train_merges(hist, 3)
    assert merges[0] == ("a", "a")
    # after merge 1: aaab -> [aa,a,b,</w>] x3, aab -> [aa,b,</w>] x2
    # pairs: (aa,a)=3, (a,b)=3, (b,</w>)=5, (aa,b)=2 -> best (b,</w>)
    assert merges[1] == ("b", B.EOW)


def test_train_matches_naive_reference():
    rng = random.Random(99)
    alpha = "abcdef"
    hist = []
    seen = set()
    for _ in range(60):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        if w not in seen:
            seen.add(w)
            hist.append((w, rng.randint(1, 50)))
    for n in (1, 5, 20, 100):
        assert B.train_merges(hist, n) == naive_train(hist, n), n


def test_encode_word_greedy_rank_order():
    merges = [("a", "b"), ("ab", "c"), ("c", B.EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    # "abc": ab (rank 0) -> abc (rank 1) -> ["abc", </w>]
    assert B.encode_word("abc", ranks) == ["abc", B.EOW]
    # "cc": only (c,</w>) applies to the trailing c
    assert B.encode_word("cc", ranks) == ["c", "c" + B.EOW]
    # no merges -> chars + EOW
    assert B.encode_word("xy", {}) == ["x", "y", B.EOW]


def test_token_counts_end_to_end(spark):
    texts = [
        "the cat sat on the mat",
        "the the the",
        "",
        "concatenation station nation",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = B.bpe_train(df, n_merges=30)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in B.bpe_token_counts(df, merges).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_encode_counts(t, merges), t
    # enough merges -> frequent short words collapse to 1 token
    ranks = {p: i for i, p in enumerate(merges)}
    assert len(B.encode_word("the", ranks)) == 1


def test_train_deterministic_across_partitionings(spark):
    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "zz"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # sum(len(w)) = 26 merges collapse every word to one symbol; ask
    # for 20 so the loop never exhausts
    m1 = B.bpe_train(df.repartition(1), n_merges=20)
    m7 = B.bpe_train(df.repartition(7), n_merges=20)
    assert m1 == m7 and len(m1) == 20
    # and the exhaustion path stops early instead of looping
    m_all = B.bpe_train(df, n_merges=100)
    assert len(m_all) <= 26


def test_word_histogram_cap(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c")], "doc_id long, text string"
    )
    hist = B.word_histogram(df, max_words=2)
    assert hist == [("a", 3), ("b", 2)]  # (count desc, word asc)


def test_pair_histogram_top_row_is_first_merge(spark):
    """pair_histogram (the hash-oracled contract stage, r8) must agree
    with the driver-side trainer: its top row under the (cnt desc,
    pair asc) ordering IS train_merges' first merge, and its counts
    equal the trainer's initial pair_counts map."""
    rng = random.Random(11)
    vocab = ["banana", "bandana", "ana", "nab", "the", "than"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = B.pair_histogram(df, top_k=1000).collect()
    got = {(r["pair_a"], r["pair_b"]): r["cnt"] for r in rows}
    # independent reference: naive pair counts over the word histogram
    hist = B.word_histogram(df)
    want: dict[tuple[str, str], int] = {}
    for w, c in hist:
        syms = list(w) + [B.EOW]
        for p in zip(syms, syms[1:]):
            want[p] = want.get(p, 0) + c
    assert got == want
    # top row == the trainer's first merge selection (same tie-break)
    first = B.train_merges(hist, 1)[0]
    assert (rows[0]["pair_a"], rows[0]["pair_b"]) == first
    # ordering contract: cnt desc, then pair asc
    keys = [(-r["cnt"], r["pair_a"], r["pair_b"]) for r in rows]
    assert keys == sorted(keys)
