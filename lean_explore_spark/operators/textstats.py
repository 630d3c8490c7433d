"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side column arithmetic (regexp / md5 / conv / aggregations) —
no Python UDFs — so each operator whole-stage-codegens AND has an
exactly mirrorable DuckDB oracle.  Scale shape: every operator is a
narrow map or a single partial-aggregated groupBy(doc_id); nothing
shuffles more than one row per (doc, token-class).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SQL_TOKENS = "regexp_extract_all(lower(text), '\\\\w+', 0)"

# tiny per-language stopword profiles (shared verbatim with the SQL
# oracle, which is generated from these lists)
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "of", "and", "a", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "en", "un", "una", "por"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}

BPE_ISH = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]"


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, hits): stopword-profile language ID.

    Argmax of per-language stopword hit counts, ties and zero-hit docs
    resolved to lang asc / 'und' — the n-gram-profile heuristic of the
    classic langid tools reduced to an exact relational form.
    """
    spark = docs.sparkSession
    sw = spark.createDataFrame(
        [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
        "lang string, tok string",
    )
    toks = docs.select("doc_id", F.explode(F.expr(SQL_TOKENS)).alias("tok"))
    hits = (
        toks.join(F.broadcast(sw), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang"))
    scored = (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "hits")
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
        )
    )


def quality_score(docs: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, punct_ratio,
    stop_ratio, quality): length/punctuation/stopword heuristics
    (the Gopher/C4-style quality-signal family), rounded 6dp.
    ``extra_cols`` ride through the (narrow) plan so downstream
    group-wise stages never self-join the corpus to refetch them."""
    en_sw = STOPWORDS["en"]
    toks = F.expr(SQL_TOKENS)
    n_tokens = F.size(toks)
    token_chars = F.expr(
        "aggregate(" + SQL_TOKENS + ", 0, (acc, t) -> acc + length(t))"
    )
    stop_hits = F.expr(
        "size(filter("
        + SQL_TOKENS
        + ", t -> t IN ("
        + ",".join(f"'{w}'" for w in en_sw)
        + ")))"
    )
    punct_chars = F.length(
        F.regexp_replace(F.col("text"), "[A-Za-z0-9_\\s]", "")
    )
    d = docs.select(
        "doc_id",
        *extra_cols,
        F.length("text").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        token_chars.alias("_tc"),
        stop_hits.alias("_sh"),
        punct_chars.alias("_pc"),
    )
    mean_tok = F.when(
        F.col("n_tokens") > 0, F.col("_tc") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("n_chars") > 0, F.col("_pc") / F.col("n_chars")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        F.col("n_tokens") > 0, F.col("_sh") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(1.0)
        - punct_ratio
        + F.lit(0.5) * stop_ratio
        - F.when(F.col("n_tokens") < 10, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        *extra_cols,
        "n_chars",
        "n_tokens",
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, word_tokens, bpe_ish_tokens): three token
    counters — whitespace split, word regex, BPE-ish regex."""
    return docs.select(
        "doc_id",
        F.size(
            F.expr(r"filter(split(text, '\\s+'), t -> t <> '')")
        ).cast("long").alias("ws_tokens"),
        F.size(F.expr(SQL_TOKENS)).cast("long").alias("word_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{BPE_ISH}', 0)")
        ).cast("long").alias("bpe_ish_tokens"),
    )


def hash_sample(
    docs: DataFrame,
    rate_permille: int,
    salt: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic content-addressed sampling: keep a row iff
    fold15(md5(salt:id)) mod 1000 < rate_permille.

    The reproducible replacement for rng ``sample()`` in training-data
    pipelines — the same row set comes back across runs, partitionings
    and ENGINES (the md5 fold is the repo's standard oracle-expressible
    hash), membership is decidable per row (narrow filter, pushes to
    the scan), and ``salt`` yields independent samples."""
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return docs.where(h < rate_permille)


def stratified_hash_sample(
    docs: DataFrame,
    rates_permille: Dict[str, int],
    strata_col: str = "lang",
    default_permille: int = 0,
    salt: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the language-rebalancing
    primitive (downsample the dominant language, keep rare ones whole).
    Same hash-threshold rule as hash_sample with a per-stratum rate;
    still one narrow filter, no shuffle, no rng state."""
    rate = None
    for key, permille in sorted(rates_permille.items()):
        cond = F.col(strata_col) == key
        rate = (
            F.when(cond, permille)
            if rate is None
            else rate.when(cond, permille)
        )
    rate = (
        rate.otherwise(default_permille)
        if rate is not None
        else F.lit(default_permille)
    )
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return docs.where(h < rate)


def quality_topk_per_group(
    docs: DataFrame, k: int = 50, group_col: str = "lang"
) -> DataFrame:
    """Keep the k highest-quality docs per group (the 'top X% by
    quality per language' pipeline stage): rank = row_number over
    (quality desc, doc_id asc) within the group — deterministic because
    quality is the 6dp-rounded score both engines agree on bit-for-bit.
    The group column rides THROUGH the quality computation (no corpus
    self-join to refetch it) so the plan is one narrow pass + ONE
    window exchange keyed by the group column; at web scale the group
    count is tiny (languages), so pair with salting only if a single
    group dominates AND k is huge (k rows per group is the output
    bound either way)."""
    from pyspark.sql import Window

    q = quality_score(docs, extra_cols=(group_col,))
    w = Window.partitionBy(group_col).orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        q.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "doc_id", group_col, "quality",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def fingerprint(docs: DataFrame, k: int = 8) -> DataFrame:
    """(doc_id, fp): rolling char-k-gram fingerprint — the minimum of
    md5-derived 60-bit ints over every k-char window (winnowing with
    window = whole doc).  Exactly mirrorable in SQL.

    Shape (r9): explode the window-start sequence, md5+fold in the
    projection, then ONE partial-aggregated groupBy(doc_id) min.  The
    md5/conv math runs inside whole-stage codegen; the old in-row
    ``array_min(transform(...))`` evaluated the lambda body
    INTERPRETED once per character position (CLAUDE.md HOF rule —
    single-consumer kept it correct but still interpreted; measured
    25.7 s → ~7 s at sf1.0).  The explode does NOT shuffle |chars|
    rows: hash partial aggregation combines map-side, so the exchange
    carries ~one row per doc per map partition."""
    return (
        docs.select("doc_id", "text")
        .select(
            "doc_id",
            F.expr(
                f"explode(sequence(1, greatest(length(text) - {k - 1}, 1)))"
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.expr(
                f"cast(conv(substring(md5(substring(text, i, {k})),"
                " 1, 15), 16, 10) as bigint)"
            ).alias("h"),
        )
        .groupBy("doc_id")
        .agg(F.min("h").alias("fp"))
    )


GOPHER_TOP_NS = (2, 3)
GOPHER_DUP_NS = (5, 8)

# Gopher document-quality rule constants (Rae et al. 2021, table A1).
# Shared verbatim with the DuckDB oracle and the crafted-case tests so
# a bound can't drift between engines.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher document-quality filter battery (Rae et al. 2021 table
    A1 — the non-repetition rules; repetition lives in
    :func:`gopher_repetition`): per document the raw signals, each
    rounded 6dp, plus ``gopher_pass`` (1 iff every rule holds,
    evaluated on the ROUNDED values so both engines agree at the
    boundary):

    - ``n_words`` in [50, 100000] — whitespace-split word count
    - ``mean_word_len`` in [3, 10] — non-whitespace chars / words
    - ``symbol_word_ratio`` <= 0.1 — '#' chars + unicode ellipsis +
      non-overlapping '...' runs, per word
    - ``bullet_line_frac`` <= 0.9 — lines whose first non-space char
      is a bullet ('•', '-', '*')
    - ``ellipsis_line_frac`` <= 0.3 — lines ending (after rtrim) with
      '…' or '...'
    - ``alpha_word_frac`` >= 0.8 — words containing [A-Za-z]
    - ``n_stop_hits`` >= 2 — DISTINCT members of the paper's stop list
      present among the lowercased word tokens

    Scale shape: ONE narrow whole-row projection — zero shuffle, zero
    joins; at 100 TB this pipelines at scan speed.  The word/line
    arrays are assembled by interpreted HOF lambdas, but each is a
    2-node body over an array consumed a handful of times (the cheap
    single-digit-node case of the CLAUDE.md HOF rule — the 30x trap
    was a 16-way md5 fold, not splits); symbol and word-char counts
    use replace()/regexp_replace() length arithmetic, no HOF at all."""
    words = r"filter(split(text, '\\s+'), w -> w <> '')"
    lines = "split(text, '\n')"
    stop_list = ",".join(f"'{w}'" for w in GOPHER_STOP_WORDS)
    raw = docs.select(
        "doc_id",
        F.expr(f"size({words})").cast("long").alias("n_words"),
        F.expr(r"length(regexp_replace(text, '\\s', ''))").alias("_wc"),
        F.expr(
            f"size(filter({words}, w -> w rlike '[A-Za-z]'))"
        ).alias("_aw"),
        F.expr(f"size({lines})").alias("_nl"),
        F.expr(
            f"size(filter({lines},"
            " l -> substring(ltrim(l), 1, 1) IN ('•','-','*')))"
        ).alias("_bl"),
        F.expr(
            f"size(filter({lines}, l -> endswith(rtrim(l), '...')"
            " OR endswith(rtrim(l), '…')))"
        ).alias("_el"),
        (
            F.expr("length(text) - length(replace(text, '#', ''))")
            + F.expr("length(text) - length(replace(text, '…', ''))")
            + F.expr(
                "(length(text) - length(replace(text, '...', ''))) div 3"
            )
        ).alias("_sym"),
        F.expr(
            f"size(array_intersect({SQL_TOKENS}, array({stop_list})))"
        ).cast("long").alias("n_stop_hits"),
    )

    def per_word(x):
        return F.when(
            F.col("n_words") > 0, F.round(x / F.col("n_words"), 6)
        ).otherwise(F.lit(0.0))

    def per_line(x):
        return F.when(
            F.col("_nl") > 0, F.round(x / F.col("_nl"), 6)
        ).otherwise(F.lit(0.0))

    m = raw.select(
        "doc_id",
        "n_words",
        per_word(F.col("_wc")).alias("mean_word_len"),
        per_word(F.col("_sym")).alias("symbol_word_ratio"),
        per_line(F.col("_bl")).alias("bullet_line_frac"),
        per_line(F.col("_el")).alias("ellipsis_line_frac"),
        per_word(F.col("_aw")).alias("alpha_word_frac"),
        "n_stop_hits",
    )
    ok = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS)
    )
    return m.withColumn(
        "gopher_pass", F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )


def gopher_repetition(docs: DataFrame) -> DataFrame:
    r"""Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1): per document, the
    character fraction covered by the single most frequent word
    {2,3}-gram (``top{n}_char_frac``) and the character fraction inside
    ALL occurrences of duplicated word {5,8}-grams
    (``dup{n}_char_frac`` — overlaps double-count, per the paper;
    values may exceed 1 on pathological repetition).  Characters are
    measured on the space-joined token stream so both engines count
    identically; the most-frequent gram tie-breaks deterministically by
    (count, gram length, gram text) descending.

    Shape (r9): every signal is doc-local, so the gram explosion never
    needs to exist as ROWS at all — one Arrow batch kernel counts the
    {2,3,5,8}-gram occurrences per document with a dict and returns six
    INTEGER aggregates (guide §4.2: hand whole batches to native/
    vectorized code instead of ~18× token volume of interpreted HOF
    gram assembly + two aggregation exchanges — measured 5.2 s → ~1 s
    at sf1.0).  The char fractions (the only floats) divide and round
    in Spark, so boundary rounding matches the previous all-JVM shape
    bit-for-bit.  Tokenization inside the kernel is ``re.ASCII \w+``
    over ``str.lower`` — exactly the JVM ``\w+``/lower semantics on
    this ASCII corpus (CLAUDE.md tokenizer rule; JVM ``\w`` is
    ASCII-only too, so the classes coincide).  One explicit-count
    repartition up front keeps the kernel parallel on single-split
    bench inputs (no-op cost at scale)."""
    sc = docs.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism, "doc_id")

    top_ns, dup_ns = GOPHER_TOP_NS, GOPHER_DUP_NS
    ns = (*top_ns, *dup_ns)

    def kernel(it):
        import re as _re

        import pandas as _pd

        pat = _re.compile(r"\w+", _re.ASCII)
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "denom": [],
            }
            cols = {n: [] for n in ns}
            for text in pdf["text"]:
                toks = pat.findall((text or "").lower())
                k = len(toks)
                # prefix char sums: gram chars = Σ token lens + (n−1)
                ps = [0] * (k + 1)
                for i, t in enumerate(toks):
                    ps[i + 1] = ps[i] + len(t)
                out["denom"].append(ps[k] + max(k - 1, 0))
                for n in ns:
                    if k < n:
                        cols[n].append(0)
                        continue
                    cnt: dict = {}
                    for j in range(k - n + 1):
                        g = tuple(toks[j : j + n])
                        cnt[g] = cnt.get(g, 0) + 1
                    if n in top_ns:
                        bc = bl = -1
                        for (g, c) in cnt.items():
                            l = sum(map(len, g)) + n - 1
                            if c > bc or (c == bc and l > bl):
                                bc, bl = c, l
                        cols[n].append(bc * bl)
                    else:
                        dup = 0
                        for (g, c) in cnt.items():
                            if c >= 2:
                                dup += c * (sum(map(len, g)) + n - 1)
                        cols[n].append(dup)
            for n in ns:
                out[f"x{n}"] = _pd.Series(cols[n], dtype="int64")
            out["denom"] = _pd.Series(out["denom"], dtype="int64")
            yield _pd.DataFrame(out)

    schema = "doc_id long, denom long, " + ", ".join(
        f"x{n} long" for n in ns
    )
    raw = docs.select("doc_id", "text").mapInPandas(kernel, schema)

    def frac(col):
        return F.when(
            F.col("denom") > 0, F.round(F.col(col) / F.col("denom"), 6)
        ).otherwise(F.lit(0.0))

    return raw.select(
        "doc_id",
        *[frac(f"x{n}").alias(f"top{n}_char_frac") for n in top_ns],
        *[frac(f"x{n}").alias(f"dup{n}_char_frac") for n in dup_ns],
    )


# C4 page-level rule constants (Raffel et al. 2020 §2.2), shared with
# the oracle and tests.  The paper's "bad words" blocklist is not
# reproduced here (external resource); the remaining rules are.
C4_MIN_SENTENCES = 3
C4_MIN_LINE_WORDS = 5


def c4_quality(docs: DataFrame) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning..." §2.2) as per-document signals:

    - ``n_sentences`` — count of sentence terminators ('.', '!', '?');
      pages with fewer than 3 sentences are dropped by the paper
    - ``terminal_punct_line_frac`` — lines ending (after rtrim) in
      '.', '!', '?' or '"' (C4 RETAINS only such lines)
    - ``short_line_frac`` — lines with fewer than 5 whitespace words
      (C4 drops them)
    - ``javascript_line_frac`` — lines containing 'javascript'
      case-insensitively (C4 drops them — cookie/JS-warning junk)
    - ``has_curly`` / ``has_lorem_ipsum`` — page-level kill flags
      (source code; placeholder text)
    - ``c4_pass`` — the page-level verdict: >= 3 sentences, no curly
      brace, no lorem ipsum.  The line-level signals parameterize the
      CLEANING step (drop lines, then re-check), which a pipeline
      applies before the page verdict; the paper's bad-words blocklist
      is an external resource and is not reproduced.

    Scale shape: one narrow zero-exchange projection, same class as
    :func:`gopher_quality` (interpreted line-array lambdas with
    2-node bodies; counting via replace()/length arithmetic)."""
    lines = "split(text, '\n')"
    line_words = r"filter(split(l, '\\s+'), w -> w <> '')"
    raw = docs.select(
        "doc_id",
        (
            F.expr("length(text) - length(replace(text, '.', ''))")
            + F.expr("length(text) - length(replace(text, '!', ''))")
            + F.expr("length(text) - length(replace(text, '?', ''))")
        ).cast("long").alias("n_sentences"),
        F.expr(f"size({lines})").alias("_nl"),
        F.expr(
            f"size(filter({lines},"
            " l -> right(rtrim(l), 1) IN ('.','!','?','\"')))"
        ).alias("_tl"),
        F.expr(
            f"size(filter({lines},"
            f" l -> size({line_words}) < {C4_MIN_LINE_WORDS}))"
        ).alias("_sl"),
        F.expr(
            f"size(filter({lines},"
            " l -> contains(lower(l), 'javascript')))"
        ).alias("_jl"),
        F.expr(
            "CASE WHEN contains(text, '{') THEN 1 ELSE 0 END"
        ).cast("long").alias("has_curly"),
        F.expr(
            "CASE WHEN contains(lower(text), 'lorem ipsum')"
            " THEN 1 ELSE 0 END"
        ).cast("long").alias("has_lorem_ipsum"),
    )

    def per_line(x):
        return F.when(
            F.col("_nl") > 0, F.round(x / F.col("_nl"), 6)
        ).otherwise(F.lit(0.0))

    m = raw.select(
        "doc_id",
        "n_sentences",
        per_line(F.col("_tl")).alias("terminal_punct_line_frac"),
        per_line(F.col("_sl")).alias("short_line_frac"),
        per_line(F.col("_jl")).alias("javascript_line_frac"),
        "has_curly",
        "has_lorem_ipsum",
    )
    ok = (
        (F.col("n_sentences") >= C4_MIN_SENTENCES)
        & (F.col("has_curly") == 0)
        & (F.col("has_lorem_ipsum") == 0)
    )
    return m.withColumn(
        "c4_pass", F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )


def unigram_nll(docs: DataFrame, broadcast_lm: bool = True) -> DataFrame:
    """Corpus-unigram language-model scoring — the relational analog of
    the CCNet/CC-quality "perplexity filter" (Wenzek et al. 2019 score
    documents with a KenLM model; here the LM is the corpus's own
    unigram distribution, so the operator is self-contained and
    exactly reproducible).  Returns (doc_id, n_tokens, avg_nll): the
    per-token average negative log-likelihood in nats, rounded 6dp —
    high values flag documents whose vocabulary is atypical for the
    corpus (gibberish, boilerplate codes, foreign text), the same
    signal the KenLM filter thresholds.

    Cross-engine exactness: float SUMMATION order differs between
    engines, so per-term log-probs are quantized FIRST —
    ``lpm = round(ln(c/total) * 1e6)`` as a bigint per DISTINCT term
    (one IEEE double op from two exact integers, identical in both
    engines) — and only INTEGER sums aggregate per doc; the final
    division of two exact integers rounds identically everywhere.

    Scale shape: one partial-aggregated groupBy(term) builds the LM
    (hot terms combine map-side); the token→LM join broadcasts the LM
    by default (vocab ≪ corpus — at web scale a 100M-term vocab is a
    few GB, still broadcastable on real executors; set
    ``broadcast_lm=False`` to let AQE pick a shuffle join with skew
    handling when it is not), and the per-doc aggregation partial-aggs
    again.  Token text crosses the wire once, in the LM groupBy.
    Zero-token docs ride the SAME aggregation via explode_outer's NULL
    row (left-joined LM, null-skipping count) — no corpus-size
    retention join at the end (plan: 1 BroadcastHashJoin, 0
    SortMergeJoin, audited)."""
    toks = docs.select(
        "doc_id", F.explode_outer(F.expr(SQL_TOKENS)).alias("tok")
    )
    lm = (
        toks.where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = lm.agg(F.sum("c").cast("long").alias("total"))
    lmp = lm.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(F.log(F.col("c") / F.col("total")) * F.lit(1_000_000.0))
        .cast("long")
        .alias("lpm"),
    )
    if broadcast_lm:
        lmp = F.broadcast(lmp)
    return (
        toks.join(lmp, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("lpm").cast("long").alias("s"),
            F.count("tok").cast("long").alias("n"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.when(
                F.col("n") > 0,
                F.round(-F.col("s") / (F.col("n") * F.lit(1_000_000.0)), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_nll"),
        )
    )


def pack_sequences(
    docs: DataFrame, budget: int = 4096, sized: DataFrame | None = None
) -> DataFrame:
    """Training-sequence packing — the pretraining data-prep step that
    concatenates the tokenized corpus in a deterministic document
    order and chunks it into fixed ``budget``-token training
    sequences (GPT-style "documents may span sequence boundaries"
    packing).  Per document: (doc_id, n_tokens, start_pos, first_seq,
    last_seq) where ``start_pos`` is the document's 0-based offset in
    the concatenated token stream, and first/last_seq are the
    sequence ids its tokens land in (empty docs take their boundary
    position with first_seq = last_seq = the sequence at start_pos).

    Scale shape — a GLOBAL prefix sum without the single-partition
    trap: a plain ``Window.orderBy(doc_id)`` with no partition key
    makes Spark move the whole relation to ONE partition (it even
    logs the warning).  Instead: repartitionByRange(doc_id) gives
    contiguous ascending doc_id ranges per partition; a per-partition
    window (partitionBy spark_partition_id) computes local running
    sums IN PARALLEL; per-partition totals (one tiny aggregate,
    #partitions rows) broadcast back as prefix offsets via a range
    join on partition id.  Two narrow shuffles + one broadcast —
    works unchanged at 10^12 docs.  All arithmetic is integer, so the
    DuckDB oracle (one window cumsum) matches bit-for-bit.

    ``sized`` (doc_id, n_tokens) overrides the default whitespace
    sizing — the BPE packing path (r8) passes real subword counts so
    the packed-sequence artifact and this assignment agree exactly.
    The ordering key stays ``doc_id``: pass a VALUE rank (e.g.
    mixing.shuffle_rank) as doc_id to pack in shuffled order."""
    from pyspark.sql import Window

    sc = docs.sparkSession.sparkContext
    nparts = max(2, sc.defaultParallelism)
    sized = (
        sized.select("doc_id", F.col("n_tokens").cast("long"))
        if sized is not None
        else docs.select(
            "doc_id",
            F.size(F.expr(SQL_TOKENS)).cast("long").alias("n_tokens"),
        )
    )
    sized = (
        sized.repartitionByRange(nparts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    # PIN the physical layout before anything consumes it twice:
    # spark_partition_id is a function of the EXECUTED layout, and the
    # window branch + the totals branch below would otherwise each
    # re-evaluate the exchange — under AQE inside a larger plan the
    # two evaluations can coalesce differently, mismatching offsets to
    # pids (the shuffle_rank 3.2M pipeline regression; shuffle_rank
    # itself was re-keyed on value buckets, but this op orders by an
    # arbitrary-distribution doc_id, so the snapshot is the fix).
    # Narrow relation — two longs + a pid per doc — so the eager
    # checkpoint is cheap at any corpus size.
    sized = sized.localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy("doc_id")
    local = sized.withColumn(
        "_local_end", F.sum("n_tokens").over(w)
    )
    totals = (
        local.groupBy("_pid")
        .agg(F.max("_local_end").alias("_ptotal"))
    )
    # prefix offset per partition: sum of totals of all LOWER pids —
    # a broadcast self-join on pid ordering (#partitions rows, tiny)
    a = totals.alias("a")
    b = totals.alias("b")
    offsets = (
        a.join(
            F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left"
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("b._ptotal"), F.lit(0)).alias("_offset")
        )
    )
    out = local.join(F.broadcast(offsets), "_pid").select(
        "doc_id",
        "n_tokens",
        (F.col("_offset") + F.col("_local_end") - F.col("n_tokens"))
        .cast("long")
        .alias("start_pos"),
    )
    return (
        out.withColumn(
            "_end",
            F.col("start_pos")
            + F.greatest(F.col("n_tokens") - 1, F.lit(0)),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_pos",
            # integer div throughout: positions reach 10^13 at corpus
            # scale and float quotients corrupt (CLAUDE.md invariant)
            F.expr(f"start_pos div {budget}").cast("long").alias(
                "first_seq"
            ),
            F.expr(f"_end div {budget}").cast("long").alias("last_seq"),
        )
    )


def pack_token_ids(
    encoded: DataFrame, budget: int = 4096, order_col: str = "doc_id",
    sized_df: DataFrame | None = None,
) -> DataFrame:
    """Materialize the packed training sequences themselves (r8,
    VERDICT r7 #4): ``encoded`` is (order_col, n_tokens-like count,
    token_ids array<int>) — bpe.bpe_encode_ids output — and the result
    is (seq_id, n_tokens, token_ids) where sequences are the
    ``budget``-sized chunks of the corpus token stream concatenated in
    ascending ``order_col`` order (GPT-style packing: documents span
    sequence boundaries).  Every sequence has exactly ``budget``
    tokens except the last.

    Scale shape: position assignment reuses :func:`pack_sequences`'
    two-phase parallel prefix sum (never a global window).  Token data
    then moves ONCE, as per-(doc, seq) array SLICES — a doc
    contributes one row per sequence it touches (≥1, +1 per boundary
    crossed), so the shuffle is O(docs + crossings) compact array rows,
    not O(tokens) scalar rows.  The per-sequence rebuild is a
    groupBy(seq_id) whose collect_list is bounded by ``budget`` pieces,
    ordered by each piece's in-sequence offset (array_sort on a
    struct — consumed once, the HOF single-consumer rule)."""
    cnt = encoded.columns[1]
    # ``sized_df`` (order_col, count) sidesteps evaluating ``encoded``
    # for the position-assignment pass when the encoder is an OPAQUE
    # Python map (column pruning cannot reach inside it, so the
    # two-column projection would otherwise run the full tokenizer+
    # hash kernel a second time; r9).
    sized = (
        sized_df.select(
            F.col(order_col).alias("doc_id"),
            F.col(sized_df.columns[1]).cast("long").alias("n_tokens"),
        )
        if sized_df is not None
        else encoded.select(
            F.col(order_col).alias("doc_id"),
            F.col(cnt).cast("long").alias("n_tokens"),
        )
    )
    pos = pack_sequences(sized, budget=budget, sized=sized)
    placed = (
        encoded.select(
            F.col(order_col).alias("doc_id"), "token_ids"
        )
        .join(pos, "doc_id")
        .where(F.col("n_tokens") > 0)
    )
    b = int(budget)
    pieces = placed.select(
        F.explode(
            F.expr("sequence(first_seq, last_seq)")
        ).alias("seq_id"),
        "token_ids",
        "start_pos",
        "n_tokens",
    ).select(
        "seq_id",
        F.expr(f"greatest(start_pos - seq_id * {b}, 0L)").alias(
            "pos_in_seq"
        ),
        F.expr(
            # 1-based slice of this doc's ids that lands in seq_id
            f"slice(token_ids, "
            f"cast(greatest(seq_id * {b} - start_pos, 0L) + 1 as int), "
            f"cast(least((seq_id + 1) * {b}, start_pos + n_tokens)"
            f" - greatest(seq_id * {b}, start_pos) as int))"
        ).alias("piece"),
    )
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.flatten(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(pos_in_seq, piece))), x -> x.piece)"
                )
            ).alias("token_ids")
        )
        .select(
            "seq_id",
            F.size("token_ids").cast("long").alias("n_tokens"),
            "token_ids",
        )
    )


def length_quantiles(
    docs: DataFrame, ps_permille: Sequence[int] = (250, 500, 750, 900, 990)
) -> DataFrame:
    """(p_permille, q_tokens): EXACT token-length quantiles of the
    corpus — the length profile a pipeline needs to pick packing
    budgets, truncation limits, and Gopher word-count bounds.

    Exact, not approximate: ``percentile_approx``'s sketch answer
    depends on merge order and has no DuckDB twin, so this computes
    the inverse empirical CDF (SQL type-1 / ``quantile_disc``
    semantics) in all-integer arithmetic: ``q_p`` = the smallest
    length whose cumulative doc count reaches ``ceil(p * N / 1000)``.

    Scale shape: the corpus collapses to a LENGTH HISTOGRAM first —
    one narrow token count + ONE partial-aggregated
    ``groupBy(n_tokens)`` whose output cardinality is bounded by the
    longest document (≤ ~10^6 distinct lengths whatever the corpus
    size), NOT by corpus rows.  The cumulative window then runs on
    that tiny relation (single-partition Window — safe ONLY because
    of the histogram bound; this is the documented exception to the
    no-global-window rule, same as pack_sequences' offsets table).
    The probe list is a handful of literals crossed against the
    histogram with a partial-aggregable min.
    """
    from pyspark.sql import Window

    for p in ps_permille:
        if not 0 < int(p) <= 1000:
            raise ValueError(f"p_permille out of (0, 1000]: {p}")
    hist = (
        docs.select(F.size(F.expr(SQL_TOKENS)).cast("long").alias("n"))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(Window.partitionBy())
    )
    probes = F.array(*[F.lit(int(p)) for p in sorted(set(ps_permille))])
    return (
        cum.select(
            "n",
            "cum",
            "total",
            F.explode(probes).alias("p_permille"),
        )
        # ceil(p*N/1000) in integers: (p*N + 999) div 1000
        .where(
            F.col("cum")
            >= F.expr("(p_permille * total + 999) div 1000")
        )
        .groupBy("p_permille")
        .agg(F.min("n").cast("long").alias("q_tokens"))
        .select(F.col("p_permille").cast("long"), "q_tokens")
    )


def chunk_passages(
    docs: DataFrame, size: int = 64, stride: int = 32
) -> DataFrame:
    """(doc_id, passage_no, start_tok, n_tokens, passage): sliding
    token windows — the retrieval-training prep step (DPR/ColBERT-style
    passage corpora; FineWeb-Edu chunk scoring) that turns documents
    into fixed-ish passages with ``size - stride`` tokens of overlap.

    Window rule (deliberately simple so the oracle is exact): starts at
    0, stride, 2·stride, … while start < n_tokens; each passage is
    ``tokens[start : start+size]`` space-rejoined, so tail passages may
    be shorter than ``size`` (and, when ``n - start < size``, suffixes
    of the previous window — kept, not special-cased).  Zero-token docs
    emit NO passages.

    Scale shape: one EXPLICIT-count repartition up front (the gopher
    lesson — this stage multiplies rows ~n/stride× and is CPU-bound,
    so AQE's byte-size coalesce must not serialize it), then everything
    is per-row: the start list assembles in-row (``sequence`` consumed
    once by the explode) and the passage text is ``array_join(slice(…))``
    — the 2-node HOF form CLAUDE.md measured ~4× cheaper per gram than
    element_at chains.  No shuffle after the repartition; output volume
    ≈ (size/stride)× corpus text, which is the sink's own cost.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    sc = docs.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism, "doc_id")
    toks = docs.select(
        "doc_id", F.expr(SQL_TOKENS).alias("_t")
    ).withColumn("_n", F.size("_t"))
    starts = toks.where(F.col("_n") > 0).select(
        "doc_id",
        "_t",
        "_n",
        F.posexplode(
            F.expr(f"sequence(0, _n - 1, {int(stride)})")
        ).alias("passage_no", "start_tok"),
    )
    return starts.select(
        "doc_id",
        F.col("passage_no").cast("long"),
        F.col("start_tok").cast("long"),
        F.least(F.lit(int(size)), F.col("_n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(
            F.expr(f"slice(_t, start_tok + 1, {int(size)})"), " "
        ).alias("passage"),
    )
