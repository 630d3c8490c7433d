"""Seed-trained NB log-odds classifier (operators/classifier.py):
hand-computed weights on crafted seeds, edge cases (OOV-only docs,
zero-token docs), score separation, a seeded-random differential vs
an independent pure-Python implementation, and the broadcast-join
plan pin for the corpus-scale scoring pass."""

from __future__ import annotations

import math
import random
import re
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F  # noqa: F401

from lean_explore_spark.operators import classifier as CL

TOK = re.compile(r"\w+")


def round6(x: float) -> float:
    """Spark's round(double, 6): HALF_UP over the shortest decimal
    repr (java BigDecimal.valueOf) — NOT Python's banker's round."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def py_weights(pos_texts, neg_texts, alpha=0.5):
    """Independent reference: quantized log-odds per term."""
    cp, cn = {}, {}
    for t in pos_texts:
        for w in TOK.findall(t.lower()):
            cp[w] = cp.get(w, 0) + 1
    for t in neg_texts:
        for w in TOK.findall(t.lower()):
            cn[w] = cn.get(w, 0) + 1
    vocab = set(cp) | set(cn)
    np_, nn, v = sum(cp.values()), sum(cn.values()), len(vocab)

    def lq(c, n):
        return int(round(math.log((c + alpha) / (n + alpha * v)) * 1e6))

    return {
        t: lq(cp.get(t, 0), np_) - lq(cn.get(t, 0), nn) for t in vocab
    }


def py_score(text, wq):
    toks = TOK.findall(text.lower())
    if not toks:
        return 0, 0.0
    s = sum(wq.get(t, 0) for t in toks)
    return len(toks), round6(s / (len(toks) * 1e6))


def _df(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


POS = ["good clean prose flows here", "good fine text reads well here"]
NEG = ["spam spam buy now click", "click spam junk junk junk"]


def test_weights_match_hand_computation(spark):
    w = {
        r["tok"]: r["wq"]
        for r in CL.nb_logodds_weights(
            _df(spark, POS), _df(spark, NEG, 10)
        ).collect()
    }
    assert w == py_weights(POS, NEG)
    assert w["good"] > 0 > w["spam"]  # seed-exclusive terms signed right


def test_scores_match_and_separate(spark):
    wq = py_weights(POS, NEG)
    corpus = POS + NEG + [
        "good fine prose",           # positive-like
        "spam junk click",           # negative-like
        "zzz qqq xxx",               # fully out-of-vocabulary
        "",                          # zero tokens
        "good spam",                 # mixed
    ]
    weights = CL.nb_logodds_weights(_df(spark, POS), _df(spark, NEG, 10))
    got = {
        r["doc_id"]: (r["n_tokens"], r["clf_score"])
        for r in CL.classifier_score(_df(spark, corpus, 100), weights).collect()
    }
    for i, text in enumerate(corpus):
        assert got[100 + i] == py_score(text, wq), text
    base = 100 + len(POS) + len(NEG)
    names = ["pos", "neg", "oov", "empty", "mix"]
    scores = {t: got[base + j][1] for j, t in enumerate(names)}
    assert scores["pos"] > 0 > scores["neg"]
    assert scores["oov"] == 0.0 and scores["empty"] == 0.0
    assert got[base + 2][0] == 3  # OOV tokens still counted
    assert got[base + 3][0] == 0  # empty doc


def test_random_differential(spark):
    rng = random.Random(1337)
    vocab = [f"w{i}" for i in range(60)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, n)))
    pos = [mk(30) for _ in range(40)]
    neg = [mk(30) for _ in range(40)]
    corpus = [mk(50) for _ in range(200)]
    wq = py_weights(pos, neg)
    weights = CL.nb_logodds_weights(_df(spark, pos), _df(spark, neg, 1000))
    got = {
        r["doc_id"]: (r["n_tokens"], r["clf_score"])
        for r in CL.classifier_score(
            _df(spark, corpus, 5000), weights
        ).collect()
    }
    assert len(got) == len(corpus)
    for i, text in enumerate(corpus):
        assert got[5000 + i] == py_score(text, wq)


def test_scoring_plan_is_broadcast(spark):
    """The corpus-scale pass must be ONE BroadcastHashJoin (weights
    table), zero SortMergeJoin — the unigram_nll plan contract."""
    import contextlib
    import io

    # materialized weights table (the production shape: the learned
    # table is an artifact loaded from storage, not a live lineage)
    weights = spark.createDataFrame(
        CL.nb_logodds_weights(_df(spark, POS), _df(spark, NEG, 10))
        .collect(),
        "tok string, wq long",
    )
    df = CL.classifier_score(_df(spark, ["a b c"] * 4, 100), weights)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_broadcast_off_falls_back_to_shuffle_join(spark):
    weights = CL.nb_logodds_weights(_df(spark, POS), _df(spark, NEG, 10))
    out = CL.classifier_score(
        _df(spark, POS + NEG, 100), weights, broadcast_weights=False
    ).collect()
    wq = py_weights(POS, NEG)
    got = {r["doc_id"]: (r["n_tokens"], r["clf_score"]) for r in out}
    for i, t in enumerate(POS + NEG):
        assert got[100 + i] == py_score(t, wq)
