"""Byte-pair-encoding subword tokenizer — train on the corpus, encode
the corpus (Sennrich et al. 2016; the GPT-2/HuggingFace word-level
variant).  The tokenizer-fitting step of a pretraining pipeline:
`token_counts`' BPE-ish regex estimates token counts, this module
computes REAL subword tokenizations with a corpus-fitted vocabulary.

Two halves with very different scale shapes, split accordingly:

* ``bpe_train``: the corpus collapses to a WORD HISTOGRAM first — one
  partial-aggregated ``groupBy(word)`` (identical shape to ``term_df``,
  the proven one-shuffle aggregation) capped at the ``max_words`` most
  frequent words (HF/SentencePiece trainers do the same; the dropped
  tail is low-mass by construction and the cap is logged).  The merge
  loop then runs DRIVER-SIDE on the histogram — vocab_size iterations
  over an indexed pair→words map, never the corpus.  This is the
  correct distribution of labor: the corpus pass is embarrassingly
  parallel, the merge loop is inherently sequential (merge i+1 depends
  on i) and operates on ≤max_words rows.
* ``bpe_encode``: merges broadcast as a rank dict; one narrow Arrow
  ``mapInPandas`` pass applying the classic greedy lowest-rank-merge
  encode per word with a per-batch word memo (Zipf makes the memo hit
  rate ≈ 1 − distinct/total, typically >90%) — zero shuffle, rows
  stream through.

No SQL oracle exists for the full encode (iterated data-dependent
merges are not expressible in one DuckDB query); correctness is pinned
by a seeded differential against an independent naive reference and
hand-computed merge sequences in tests/test_bpe.py, and the contract
row is documented rows-only.  Determinism: ties in pair counts break
lexicographically, so the merge list is a pure function of the
histogram (itself a pure function of the corpus) — identical across
partitionings, runs, and machines.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lean_explore_spark.operators.textstats import SQL_TOKENS

Merge = Tuple[str, str]

# end-of-word sentinel (GPT-2 uses a leading space variant; the
# </w>-suffix form keeps every symbol printable for tests/debugging)
EOW = "</w>"


def word_histogram(
    docs: DataFrame, max_words: int = 1_000_000
) -> List[Tuple[str, int]]:
    """(word, count) for the ``max_words`` most frequent corpus words.

    One shuffle (partial-agg groupBy) + a bounded top-k collect — the
    ONLY corpus-touching step of training.  Deterministic order:
    (count desc, word asc).
    """
    rows = (
        docs.select(F.explode(F.expr(SQL_TOKENS)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(int(max_words))
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def pair_histogram(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """(pair_a, pair_b, cnt): symbol-pair statistics of the INITIAL
    (characters + EOW) word decomposition — exactly the trainer's
    first merge-selection input.  Row 1 under (cnt desc, pair asc) IS
    the first merge ``train_merges`` picks (asserted in
    tests/test_bpe.py), which makes the trainer's SQL-expressible
    stage hash-oracle-able for the driver gate (VERDICT r7 #3) while
    the iterated merges keep their documented rows-only exemption.

    Scale shape: one word-histogram shuffle (partial-agg groupBy over
    the corpus), then the char-pair explode runs on DISTINCT WORDS
    only, weighted by count, into one partial-agg groupBy on two short
    strings.  The corpus is touched once; the HOF arrays are built and
    consumed once per distinct word (single-consumer rule).
    """
    words = (
        docs.select(F.explode(F.expr(SQL_TOKENS)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    syms = F.expr(
        "concat(transform(sequence(1, char_length(w)),"
        f" i -> substring(w, i, 1)), array('{EOW}'))"
    )
    pairs = F.expr(
        "transform(sequence(1, size(_syms) - 1), i -> named_struct("
        "'a', element_at(_syms, i), 'b', element_at(_syms, i + 1)))"
    )
    return (
        words.select("c", syms.alias("_syms"))
        .select("c", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.a").alias("pair_a"), F.col("p.b").alias("pair_b")
        )
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair_a"), F.asc("pair_b"))
        .limit(int(top_k))
    )


def train_merges(
    histogram: List[Tuple[str, int]], n_merges: int
) -> List[Merge]:
    """Classic BPE training over a word histogram, driver-side.

    Indexed implementation: a pair→count map plus a pair→{word ids}
    inverted index; each merge touches only the words that contain the
    merged pair, so the loop is O(n_merges × words-per-pair), not
    O(n_merges × |histogram|).  Ties break on the lexicographically
    smallest pair — fully deterministic.
    """
    words: List[List[str]] = [
        list(w) + [EOW] for w, _ in histogram
    ]
    counts = [c for _, c in histogram]

    pair_counts: Dict[Merge, int] = {}
    pair_words: Dict[Merge, set] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(i)

    merges: List[Merge] = []
    for _ in range(n_merges):
        best = None
        best_c = 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c <= 0:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        affected = list(pair_words.get(best, ()))
        for i in affected:
            syms = words[i]
            c = counts[i]
            # remove this word's contribution to all its pairs
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        pair_words.pop(p, None)
            # apply the merge left-to-right
            out: List[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # re-add contributions
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)
    return merges


def bpe_train(
    docs: DataFrame, n_merges: int = 1000, max_words: int = 1_000_000
) -> List[Merge]:
    """One corpus pass + driver merge loop; see module docstring."""
    return train_merges(word_histogram(docs, max_words), n_merges)


def bpe_vocab(
    histogram: List[Tuple[str, int]], merges: List[Merge]
) -> Dict[str, int]:
    """Deterministic symbol → id map for a trained tokenizer: the
    corpus alphabet (single characters + EOW), sorted, takes ids
    0..|A|-1, then each merge product takes the next id in merge
    order (the GPT-2/SentencePiece convention: base vocabulary first,
    learned merges appended).  A pure function of (histogram, merges),
    so ids are stable across runs/partitionings like the merges
    themselves."""
    alphabet = {EOW}
    for w, _ in histogram:
        alphabet.update(w)
    vocab: Dict[str, int] = {
        s: i for i, s in enumerate(sorted(alphabet))
    }
    for a, b in merges:
        ab = a + b
        if ab not in vocab:
            vocab[ab] = len(vocab)
    return vocab


def bpe_train_full(
    docs: DataFrame, n_merges: int = 1000, max_words: int = 1_000_000
) -> Tuple[List[Merge], Dict[str, int]]:
    """(merges, vocab) from ONE histogram pass — the corpus is
    touched once; both artifacts are pure functions of the histogram."""
    hist = word_histogram(docs, max_words)
    merges = train_merges(hist, n_merges)
    return merges, bpe_vocab(hist, merges)


def encode_word(word: str, ranks: Dict[Merge, int]) -> List[str]:
    """Greedy lowest-rank-first BPE encode of one word (HF semantics:
    repeatedly merge the present pair with the smallest merge rank)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_token_counts(docs: DataFrame, merges: List[Merge]) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): real subword token counts.

    Broadcast the merge ranks, one narrow Arrow pass, per-batch word
    memo.  Zero shuffle; at 100 TB this is scan-bound like pii_scrub.
    """
    import pandas as pd

    spark = docs.sparkSession
    ranks = {p: i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    tok = docs.select(
        "doc_id", F.expr(SQL_TOKENS).alias("_words")
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = bc.value
        memo: Dict[str, int] = {}
        for pdf in batches:
            n_words = []
            n_bpe = []
            for words in pdf["_words"]:
                total = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(encode_word(w, r))
                        memo[w] = n
                    total += n
                n_words.append(len(words))
                n_bpe.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                }
            )

    return tok.mapInPandas(
        enc, schema="doc_id long, n_words long, n_bpe_tokens long"
    )


def bpe_encode_ids(
    docs: DataFrame, merges: List[Merge], vocab: Dict[str, int]
) -> DataFrame:
    """(doc_id, n_bpe_tokens, token_ids): the MATERIALIZED subword id
    stream per doc — what a training pipeline actually emits (the
    counting twin is :func:`bpe_token_counts`).  Same shape: merge
    ranks + vocab broadcast once, one narrow Arrow pass with a
    per-batch word→ids memo, zero shuffle.  A symbol outside the vocab
    (impossible when encoding the corpus the tokenizer was fitted on;
    possible for unseen text) maps to id -1 — an explicit OOV marker
    rather than a silent skip, so token counts stay conserved."""
    import pandas as pd

    spark = docs.sparkSession
    ranks = {p: i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast((ranks, vocab))
    tok = docs.select("doc_id", F.expr(SQL_TOKENS).alias("_words"))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r, v = bc.value
        memo: Dict[str, List[int]] = {}
        for pdf in batches:
            ids_col = []
            n_col = []
            for words in pdf["_words"]:
                ids: List[int] = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = [
                            v.get(s, -1) for s in encode_word(w, r)
                        ]
                        memo[w] = got
                    ids.extend(got)
                ids_col.append(ids)
                n_col.append(len(ids))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe_tokens": pd.Series(n_col, dtype="int64"),
                    "token_ids": ids_col,
                }
            )

    return tok.mapInPandas(
        enc,
        schema="doc_id long, n_bpe_tokens long, token_ids array<int>",
    )
