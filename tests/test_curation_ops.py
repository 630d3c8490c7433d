"""Hand-computed semantics for the r7 curation operators: C4 cleaning
heuristics (textstats.c4_quality — Raffel et al. 2020 §2.2 analog),
corpus-unigram LM scoring (textstats.unigram_nll — CCNet perplexity-
filter analog), and corpus-wide duplicate-line removal
(dedup.dedup_lines — CCNet boilerplate filter).  The DuckDB oracle
gate (test_driver_contract) checks engine parity; these pin the
SEMANTICS against worked examples so both engines can't drift
together."""

from __future__ import annotations

import math

import pytest

from lean_explore_spark.operators import dedup as D
from lean_explore_spark.operators import textstats as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_quality_hand_example(spark):
    text = (
        "This is a proper full sentence.\n"
        "short line\n"
        'He said "stop right there!"\n'
        "Please enable JavaScript to continue browsing now?"
    )
    r = T.c4_quality(_docs(spark, [(1, text)])).collect()[0]
    assert r.n_sentences == 3  # '.', '!', '?'
    # lines ending . / " / ? -> 3 of 4 (the quote counts per the rule)
    assert r.terminal_punct_line_frac == pytest.approx(0.75)
    assert r.short_line_frac == pytest.approx(0.25)  # 'short line'
    assert r.javascript_line_frac == pytest.approx(0.25)
    assert r.has_curly == 0 and r.has_lorem_ipsum == 0
    assert r.c4_pass == 1


def test_c4_quality_kill_flags_and_sentence_floor(spark):
    rows = [
        (1, "One sentence only."),                      # < 3 sentences
        (2, "A. B. C. but code { here }"),              # curly brace
        (3, "A. B. C. and Lorem Ipsum filler text."),   # lorem ipsum
        (4, "A. B. C."),                                # passes
        (5, ""),                                        # degenerate
    ]
    out = {r.doc_id: r for r in T.c4_quality(_docs(spark, rows)).collect()}
    assert out[1].c4_pass == 0 and out[1].n_sentences == 1
    assert out[2].c4_pass == 0 and out[2].has_curly == 1
    assert out[3].c4_pass == 0 and out[3].has_lorem_ipsum == 1
    assert out[4].c4_pass == 1
    assert out[5].c4_pass == 0 and out[5].n_sentences == 0
    for r in out.values():  # NULL-free contract
        assert r.terminal_punct_line_frac is not None
        assert r.short_line_frac is not None


def test_unigram_nll_hand_example(spark):
    # corpus: doc1 = "a a b", doc2 = "b c" -> counts a:2 b:2 c:1,
    # total 5.  lpm(t) = round(ln(c/5)*1e6); doc scores are integer
    # sums / (n * 1e6), negated.
    rows = [(1, "a a b"), (2, "b c")]
    out = {
        r.doc_id: r for r in T.unigram_nll(_docs(spark, rows)).collect()
    }
    lpm = {
        t: round(math.log(c / 5) * 1_000_000)
        for t, c in (("a", 2), ("b", 2), ("c", 1))
    }
    want1 = round(-(2 * lpm["a"] + lpm["b"]) / (3 * 1_000_000), 6)
    want2 = round(-(lpm["b"] + lpm["c"]) / (2 * 1_000_000), 6)
    assert out[1].n_tokens == 3
    assert out[1].avg_nll == pytest.approx(want1, abs=0)
    assert out[2].n_tokens == 2
    assert out[2].avg_nll == pytest.approx(want2, abs=0)
    # rare vocabulary scores strictly worse (higher NLL)
    assert out[2].avg_nll > out[1].avg_nll


def test_unigram_nll_degenerate_and_rare_flagging(spark):
    # the common-word doc scores near the corpus baseline; the doc of
    # hapaxes scores the corpus maximum; empty doc -> (0, 0.0)
    common = " ".join(["the"] * 50)
    rare = " ".join(f"z{i}" for i in range(10))
    out = {
        r.doc_id: r
        for r in T.unigram_nll(
            _docs(spark, [(1, common), (2, rare), (3, "")])
        ).collect()
    }
    assert out[3].n_tokens == 0 and out[3].avg_nll == 0.0
    assert out[2].avg_nll > out[1].avg_nll
    # hapax NLL = -ln(1/60) quantized
    want = round(-round(math.log(1 / 60) * 1e6) / 1e6, 6)
    assert out[2].avg_nll == pytest.approx(want, abs=0)


def test_dedup_lines_keep_first_cross_doc(spark):
    boiler = "Accept cookies to continue"
    rows = [
        (1, f"unique alpha\n{boiler}\nunique beta"),
        (2, f"{boiler}\nunique gamma"),
        (3, "unique delta"),
    ]
    out = {
        r.doc_id: r for r in D.dedup_lines(_docs(spark, rows)).collect()
    }
    # doc 1 (lowest doc_id) keeps the boilerplate line; doc 2 loses it
    assert out[1].clean_text == f"unique alpha\n{boiler}\nunique beta"
    assert out[1].n_removed_lines == 0
    assert out[2].clean_text == "unique gamma"
    assert out[2].n_removed_lines == 1
    assert out[3].clean_text == "unique delta"
    assert out[3].n_removed_lines == 0


def test_dedup_lines_self_repeat_and_keep_none(spark):
    rows = [(7, "x y z\nmiddle\nx y z")]
    first = D.dedup_lines(_docs(spark, rows), keep="first").collect()[0]
    assert first.clean_text == "x y z\nmiddle"
    assert first.n_removed_lines == 1
    none = D.dedup_lines(_docs(spark, rows), keep="none").collect()[0]
    assert none.clean_text == "middle"
    assert none.n_removed_lines == 2


def test_dedup_lines_fully_cut_and_order_preserved(spark):
    rows = [
        (1, "dup\ndup"),          # global first survives, twin cut
        (2, "dup"),               # fully cut -> empty clean_text
        (3, "c\nb\na"),           # untouched, original order kept
    ]
    out = {
        r.doc_id: r for r in D.dedup_lines(_docs(spark, rows)).collect()
    }
    assert out[1].clean_text == "dup" and out[1].n_removed_lines == 1
    assert out[2].clean_text == "" and out[2].n_removed_lines == 1
    assert out[3].clean_text == "c\nb\na" and out[3].n_removed_lines == 0


def test_dedup_lines_bad_policy(spark):
    with pytest.raises(ValueError):
        D.dedup_lines(_docs(spark, [(1, "x")]), keep="last")


def _seq(lo, n):
    return " ".join(f"w{i}" for i in range(lo, lo + n))


def test_decontaminate_flags_overlap(spark):
    # probe doc shares its 10-token middle with corpus doc 2 only;
    # doc 2's overlap holds 10-8+1 = 3 matching 8-gram positions
    leak = _seq(500, 10)
    corpus = _docs(spark, [
        (1, _seq(0, 30)),
        (2, _seq(100, 20) + " " + leak + " " + _seq(200, 5)),
        (3, _seq(300, 6)),          # too short for any 8-gram
    ])
    probes = _docs(spark, [(99, _seq(900, 4) + " " + leak)])
    out = {
        r.doc_id: (r.hit_grams, r.contaminated)
        for r in D.decontaminate(corpus, probes).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (3, 1)
    assert out[3] == (0, 0)


def test_decontaminate_self_and_repeated_hits(spark):
    # a probe that IS a corpus doc: every gram position hits (12
    # tokens -> 5 positions); a doc repeating a leaked gram twice
    # counts BOTH positions (position-level counting, not distinct)
    block = _seq(0, 12)
    g8 = _seq(0, 8)
    corpus = _docs(spark, [
        (1, block),
        (2, g8 + " zq " + g8),
    ])
    probes = _docs(spark, [(99, block)])
    out = {
        r.doc_id: (r.hit_grams, r.contaminated)
        for r in D.decontaminate(corpus, probes).collect()
    }
    assert out[1] == (5, 1)
    assert out[2] == (2, 1)  # the 8-gram at pos 1 and pos 10


def test_decontaminate_crafted_eval_probe(spark):
    """The realistic probe shape jobs/curation_bench.py measures at
    scale (VERDICT r7 #7): an eval-style QUESTION wrapping a verbatim
    10-token span lifted from a corpus doc.  Position-level checks:
    the boilerplate adds no hits (seam grams carry <8 corpus tokens),
    the lifted span yields exactly 10-8+1 = 3 doc gram positions, and
    a one-word paraphrase breaks every 8-gram run to zero."""
    body = _seq(0, 30)
    corpus = _docs(spark, [(1, body), (2, _seq(100, 30))])
    span = _seq(5, 10)                       # doc 1 tokens 5..14
    tokens = span.split()
    tokens[5] = "paraphrased"                # break the middle
    para = " ".join(tokens)
    boiler_pre = "question which passage states that"
    boiler_post = "answer choices follow below"
    probes = _docs(spark, [
        (900, f"{boiler_pre} {span} {boiler_post}"),
        (901, f"{boiler_pre} {para} {boiler_post}"),
    ])
    out = {
        r.doc_id: (r.hit_grams, r.contaminated)
        for r in D.decontaminate(corpus, probes).collect()
    }
    assert out[1] == (3, 1)   # exactly positions 5, 6, 7 of doc 1
    assert out[2] == (0, 0)   # untouched doc stays clean


def test_pack_sequences_hand_example(spark):
    # budget 10; docs (in doc_id order) of 4, 9, 0, 10, 3 tokens:
    # starts 0, 4, 13, 13, 23; ends 3, 12, 13, 22, 25
    rows = [
        (1, _seq(0, 4)),
        (2, _seq(10, 9)),
        (3, ""),
        (4, _seq(30, 10)),
        (5, _seq(50, 3)),
    ]
    out = {
        r.doc_id: (r.n_tokens, r.start_pos, r.first_seq, r.last_seq)
        for r in T.pack_sequences(_docs(spark, rows), budget=10).collect()
    }
    assert out[1] == (4, 0, 0, 0)
    assert out[2] == (9, 4, 0, 1)    # spans the 10-token boundary
    assert out[3] == (0, 13, 1, 1)   # empty doc sits at its offset
    assert out[4] == (10, 13, 1, 2)
    assert out[5] == (3, 23, 2, 2)


def test_pack_sequences_matches_single_window_and_parallelism(spark):
    # the two-phase parallel prefix sum must equal the trivial global
    # cumsum, at any partitioning of the input
    import itertools

    rows = [(i, _seq(i * 50, (i * 7) % 23)) for i in range(1, 200)]
    docs = _docs(spark, rows)
    lens = {i: (i * 7) % 23 for i in range(1, 200)}
    acc, want = 0, {}
    for i in sorted(lens):
        want[i] = (lens[i], acc)
        acc += lens[i]
    for reparted in (docs, docs.repartition(13), docs.coalesce(1)):
        got = {
            r.doc_id: (r.n_tokens, r.start_pos)
            for r in T.pack_sequences(reparted, budget=4096).collect()
        }
        assert got == want


def _random_corpus(seed, n_docs=60):
    """Seeded corpus with deliberately colliding lines and varied
    token counts (ASCII so the JVM and Python \\w+ analyzers agree)."""
    import random

    rng = random.Random(seed)
    line_pool = [
        " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "eps"])
            for _ in range(rng.randint(0, 6))
        )
        for _ in range(25)
    ]
    rows = []
    for i in range(n_docs):
        n_lines = rng.randint(0, 8)
        text = "\n".join(
            rng.choice(line_pool) for _ in range(n_lines)
        ) if n_lines else ""
        rows.append((1000 + i, text))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("keep", ["first", "none"])
def test_dedup_lines_differential_random(spark, seed, keep):
    rows = _random_corpus(seed)

    # pure-Python reference
    from collections import Counter

    stream = [
        (d, i, ln)
        for d, t in sorted(rows)
        for i, ln in enumerate(t.split("\n"))
    ]
    counts = Counter(ln for _, _, ln in stream)
    first = {}
    for d, i, ln in stream:
        first.setdefault(ln, (d, i))
    want = {}
    for d, t in rows:
        kept, removed = [], 0
        for i, ln in enumerate(t.split("\n")):
            cut = (
                first[ln] != (d, i)
                if keep == "first"
                else counts[ln] >= 2
            )
            if cut:
                removed += 1
            else:
                kept.append(ln)
        want[d] = ("\n".join(kept), removed)

    got = {
        r.doc_id: (r.clean_text, r.n_removed_lines)
        for r in D.dedup_lines(_docs(spark, rows), keep=keep).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_pack_sequences_differential_random(spark, seed):
    import re

    rows = _random_corpus(seed, n_docs=120)
    budget = 7
    lens = {
        d: len(re.findall(r"\w+", t.lower())) for d, t in rows
    }
    acc, want = 0, {}
    for d in sorted(lens):
        n = lens[d]
        start, end = acc, acc + max(n - 1, 0)
        want[d] = (n, start, start // budget, end // budget)
        acc += n
    got = {
        r.doc_id: (r.n_tokens, r.start_pos, r.first_seq, r.last_seq)
        for r in T.pack_sequences(
            _docs(spark, rows), budget=budget
        ).collect()
    }
    assert got == want
