"""Hand-computed semantics for the r6 repetition operators: exact
substring dedup spans (dedup.dup_span_runs — Lee et al. 2022 analog)
and Gopher repetition signals (textstats.gopher_repetition — Rae et
al. 2021 table A1 analog).  The DuckDB oracle gate
(test_driver_contract) checks engine parity; these pin the SEMANTICS
against worked examples so both engines can't drift together."""

from __future__ import annotations

import pytest

from lean_explore_spark.operators import dedup as D
from lean_explore_spark.operators import textstats as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = "w{} "  # distinct filler tokens


def _seq(lo, n):
    return " ".join(f"w{i}" for i in range(lo, lo + n))


def test_cross_doc_span_found_and_maximal(spark):
    # docs 1 and 2 share tokens 100..111 (12 tokens) embedded in
    # otherwise-unique streams -> one maximal span each: 5 dup 8-grams
    # merged into a single run of 12 tokens
    shared = _seq(100, 12)
    rows = [
        (1, _seq(0, 10) + " " + shared + " " + _seq(200, 10)),
        (2, _seq(300, 10) + " " + shared + " " + _seq(400, 10)),
    ]
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in D.dup_span_runs(_docs(spark, rows)).collect()
    }
    # span = positions 11..22 in both docs (1-based), 12-5+1=5 grams...
    # 12 tokens hold 12-8+1 = 5 overlapping 8-grams
    assert got == {(1, 11, 22, 5), (2, 11, 22, 5)}


def test_self_repeat_counts_and_runs_split(spark):
    # one doc, the same 8 tokens twice in a row with a unique wedge:
    # the 8-gram at pos 1 equals the one at pos 10; bridging grams
    # appear once -> TWO spans, not one merged run
    block = _seq(0, 8)
    rows = [(7, block + " wX " + block)]
    got = sorted(
        (r.span_start, r.span_end, r.n_grams)
        for r in D.dup_span_runs(_docs(spark, rows)).collect()
    )
    assert got == [(1, 8, 1), (10, 17, 1)]


def test_below_length_and_unique_docs_emit_nothing(spark):
    rows = [
        (1, _seq(0, 7)),          # shorter than l=8: no grams at all
        (2, _seq(500, 40)),       # unique content: no hot grams
    ]
    assert D.dup_span_runs(_docs(spark, rows)).count() == 0


def test_cut_dup_spans_all_copies(spark):
    # both docs lose the shared 12-token span (all-copies policy);
    # the rebuilt text is the surviving token stream in order
    shared = _seq(100, 12)
    rows = [
        (1, _seq(0, 10) + " " + shared + " " + _seq(200, 10)),
        (2, _seq(300, 10) + " " + shared + " " + _seq(400, 10)),
        (3, _seq(900, 9)),  # unique doc passes through untouched
    ]
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in D.cut_dup_spans(_docs(spark, rows)).collect()
    }
    assert got[1] == (_seq(0, 10) + " " + _seq(200, 10), 12)
    assert got[2] == (_seq(300, 10) + " " + _seq(400, 10), 12)
    assert got[3] == (_seq(900, 9), 0)


def test_cut_dup_spans_degenerate_and_total_cut(spark):
    # identical 8-token docs are cut to nothing; empty doc survives
    block = _seq(0, 8)
    rows = [(1, block), (2, block), (3, "")]
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in D.cut_dup_spans(_docs(spark, rows)).collect()
    }
    assert got == {1: ("", 8), 2: ("", 8), 3: ("", 0)}


def test_cut_keep_first_preserves_one_copy(spark):
    # keep="first": doc 1 (lowest doc_id) keeps the shared span, doc 2
    # loses it; the unique doc is untouched
    shared = _seq(100, 12)
    rows = [
        (1, _seq(0, 10) + " " + shared),
        (2, _seq(300, 10) + " " + shared),
        (3, _seq(900, 9)),
    ]
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in D.cut_dup_spans(_docs(spark, rows), keep="first").collect()
    }
    assert got[1] == (_seq(0, 10) + " " + shared, 0)
    assert got[2] == (_seq(300, 10), 12)
    assert got[3] == (_seq(900, 9), 0)


def test_cut_keep_first_self_repeat_keeps_earliest(spark):
    # identical 8-token block twice within ONE doc: the pos-1 copy
    # survives, the pos-10 copy is cut
    block = _seq(0, 8)
    rows = [(5, block + " wX " + block)]
    r = D.cut_dup_spans(_docs(spark, rows), keep="first").collect()[0]
    # clean_text is the lowercased token stream ("wX" -> "wx")
    assert (r.clean_text, r.n_removed_tokens) == (block + " wx", 8)


def test_keep_first_narrow_key_collision_cuts_wide_key_rescues(spark):
    """Pin the collision-silence story of the keep-first span key
    (VERDICT r6 #3).  At the production 60-bit width, md5 preimages
    aren't craftable in a unit test, so ``_key_hex_chars=1`` narrows
    the key to 4 bits (16 buckets): 40 DISTINCT duplicated span texts
    then guarantee colliding keys by pigeonhole.  A collision falsely
    merges two distinct span texts into one keep-first group, so a
    span's FIRST occurrence (which text-keyed truth keeps) is cut —
    strictly more tokens removed than truth.  ``wide_keys=True`` adds
    a second independent 60-bit column and must restore the
    text-keyed result exactly, at the same narrow first column."""
    rows = []
    for i in range(40):
        span = _seq(10_000 + 100 * i, 12)  # distinct 12-token spans
        rows.append((i + 1, _seq(100_000 + 100 * i, 10) + " " + span))
        rows.append((i + 101, _seq(200_000 + 100 * i, 10) + " " + span))
    docs = _docs(spark, rows)

    def removed(**kw):
        out = D.cut_dup_spans(docs, keep="first", **kw).collect()
        return (
            sum(r.n_removed_tokens for r in out),
            {r.doc_id: r.clean_text for r in out},
        )

    truth_n, truth_text = removed()  # 60-bit default: exact here
    assert truth_n == 40 * 12  # each span cut once (the doc>=101 copy)
    narrow_n, _ = removed(_key_hex_chars=1)
    assert narrow_n > truth_n  # >=1 forced collision cut a 1st copy
    wide_n, wide_text = removed(_key_hex_chars=1, wide_keys=True)
    assert (wide_n, wide_text) == (truth_n, truth_text)


def test_keep_first_wide_keys_match_default(spark):
    # on an ordinary corpus the wide key is a pure widening: byte-equal
    # output to the default 60-bit key
    shared = _seq(100, 12)
    rows = [
        (1, _seq(0, 10) + " " + shared),
        (2, _seq(300, 10) + " " + shared),
        (3, _seq(900, 9)),
    ]
    docs = _docs(spark, rows)
    a = sorted(
        D.cut_dup_spans(docs, keep="first").collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        D.cut_dup_spans(docs, keep="first", wide_keys=True).collect(),
        key=lambda r: r.doc_id,
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gopher_hand_example(spark):
    # "aa aa aa bb": 2-grams = [aa aa]x2, [aa bb]x1 -> top2 = 2*5=10
    # chars over denom len("aa aa aa bb")=11; 3-grams = [aa aa aa]x1,
    # [aa aa bb]x1 -> tie on count, longer... equal length 8, text
    # tie-break DESC picks "aa aa bb" -> 8/11; no 5- or 8-grams.
    rows = [(1, "aa aa aa bb")]
    r = T.gopher_repetition(_docs(spark, rows)).collect()[0]
    assert r.doc_id == 1
    assert r.top2_char_frac == pytest.approx(round(10 / 11, 6))
    assert r.top3_char_frac == pytest.approx(round(8 / 11, 6))
    assert r.dup5_char_frac == 0.0
    assert r.dup8_char_frac == 0.0


def test_gopher_dup_fraction_double_counts_overlaps(spark):
    # 10 copies of the same token: every 5-gram ("c c c c c", len 9)
    # occurs 6 times -> dup5 = 6*9 / len("c ... c"=19) ; dup8: 3
    # occurrences of the 15-char 8-gram -> 45/19 > 1 (documented
    # overlap double-counting, as in the paper)
    rows = [(3, " ".join(["c"] * 10))]
    r = T.gopher_repetition(_docs(spark, rows)).collect()[0]
    assert r.dup5_char_frac == pytest.approx(round(6 * 9 / 19, 6))
    assert r.dup8_char_frac == pytest.approx(round(3 * 15 / 19, 6))
    assert r.top2_char_frac == pytest.approx(round(9 * 3 / 19, 6))


def test_gopher_quality_hand_example(spark):
    # 60 words, all rules satisfied: mean word len in [3,10], no
    # symbols/bullets/ellipses, fully alphabetic, 3 distinct stop words
    good = " ".join(
        ["the", "cat", "and", "dog", "that", "runs"] * 10
    )
    r = {
        x.doc_id: x
        for x in T.gopher_quality(_docs(spark, [(1, good)])).collect()
    }[1]
    assert r.n_words == 60
    # chars: (3+3+3+3+4+4)*10 = 200 over 60 words
    assert r.mean_word_len == pytest.approx(round(200 / 60, 6))
    assert r.symbol_word_ratio == 0.0
    assert r.bullet_line_frac == 0.0
    assert r.ellipsis_line_frac == 0.0
    assert r.alpha_word_frac == 1.0
    assert r.n_stop_hits == 3  # the, and, that (distinct)
    assert r.gopher_pass == 1


def test_gopher_quality_each_rule_fails_independently(spark):
    base_words = ["the", "cat", "and", "dog", "that", "runs"] * 10
    good = " ".join(base_words)
    rows = [
        (1, good),                              # pass
        (2, " ".join(base_words[:30])),         # 30 words < 50
        (3, " ".join(["ab"] * 25 + ["the", "and"] * 13)),  # mwl < 3
        (4, good + " " + "# " * 7),             # 7 symbols / 67 words > 0.1
        (5, "• " + good.replace(" cat ", "\n• cat ")),  # all lines bulleted
        (6, good.replace(" runs", " runs...\n") + "tail"),  # ellipsis lines
        (7, " ".join(["123", "456"] * 30 + ["the", "and"] * 5)),  # alpha<0.8
        (8, " ".join(["cat", "dog", "run", "sit"] * 15)),  # 0 stop hits
    ]
    out = {
        r.doc_id: r for r in T.gopher_quality(_docs(spark, rows)).collect()
    }
    assert out[1].gopher_pass == 1
    assert out[2].gopher_pass == 0 and out[2].n_words == 30
    assert out[3].gopher_pass == 0 and out[3].mean_word_len < 3.0
    assert out[4].gopher_pass == 0 and out[4].symbol_word_ratio > 0.1
    assert out[5].gopher_pass == 0 and out[5].bullet_line_frac > 0.9
    assert out[6].gopher_pass == 0 and out[6].ellipsis_line_frac > 0.3
    assert out[7].gopher_pass == 0 and out[7].alpha_word_frac < 0.8
    assert out[8].gopher_pass == 0 and out[8].n_stop_hits == 0


def test_gopher_quality_symbol_and_line_counting(spark):
    # symbols: 2 '#' + 1 '…' + 1 '...' (5 dots = one non-overlapping
    # run + 2 leftovers) = 4 over 8 words; lines: 4 total, 2 bulleted
    # ('-' and '*'), 1 ellipsis-ended ('…' after rtrim)
    text = "alpha # beta ## gamma ..... delta …\n- one\n* two\nthree … "
    r = T.gopher_quality(_docs(spark, [(9, text)])).collect()
    row = {x.doc_id: x for x in r}[9]
    # words: alpha,#,beta,##,gamma,.....,delta,…,-,one,*,two,three,…
    assert row.n_words == 14
    assert row.symbol_word_ratio == pytest.approx(round((3 + 2 + 1) / 14, 6))
    assert row.bullet_line_frac == pytest.approx(0.5)
    assert row.ellipsis_line_frac == pytest.approx(0.5)
    assert row.gopher_pass == 0


def test_gopher_quality_degenerate_null_free(spark):
    out = T.gopher_quality(
        _docs(spark, [(1, ""), (2, "   "), (3, "solo")])
    ).collect()
    assert {r.doc_id for r in out} == {1, 2, 3}
    for r in out:
        assert r.gopher_pass == 0
        for c in (
            "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
            "ellipsis_line_frac", "alpha_word_frac",
        ):
            assert getattr(r, c) is not None, (r.doc_id, c)


def test_gopher_degenerate_docs_null_free(spark):
    # 0 tokens and 1 token: all fractions 0.0, rows retained, no NULLs
    rows = [(1, ""), (2, "solo"), (3, "!!!")]
    out = T.gopher_repetition(_docs(spark, rows)).collect()
    assert {r.doc_id for r in out} == {1, 2, 3}
    for r in out:
        for c in (
            "top2_char_frac", "top3_char_frac",
            "dup5_char_frac", "dup8_char_frac",
        ):
            assert getattr(r, c) == 0.0, (r.doc_id, c)
