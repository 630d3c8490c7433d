"""Analysis operators: text → per-doc term frequencies, doc stats, dictionary.

Scale design (SURVEY.md §3.3): tokenization+tf happens in ONE Arrow
pandas UDF that emits a ``map<string,int>`` per document.  This is the
map-side combine for the biggest shuffle in the whole pipeline — the
per-(term,doc) tuples leave the scan stage already aggregated, so the
exchange that builds posting lists moves |vocab ∩ doc| entries per doc
instead of one row per token occurrence (~5-10× fewer rows on natural
text, and no ``groupBy(term, doc)`` shuffle at all for tf).

Everything downstream is plain DataFrame ops that Catalyst can push
down / prune / partially aggregate (reference analog: the implicit
per-query corpus build inside rank_bm25, local/search.py:674; our
explicit artifacts per SURVEY.md §1.1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from functools import lru_cache

from lean_explore_spark.functions.porter import porter_stem
from lean_explore_spark.functions.tokenizer import _WORD_RE

# porter_stem is pure; token frequency follows Zipf, so a bounded memo
# turns the per-OCCURRENCE stemming cost into a per-DISTINCT-term one
# (r9: the staging analyze pass was the index build's largest stage).
# lru_cache keeps worker memory bounded at web-scale vocabularies.
_stem_cached = lru_cache(maxsize=1 << 20)(porter_stem)


def _tf_of(text: str, stem: bool) -> dict:
    freqs: dict = {}
    if not text:
        return freqs
    if stem:
        for tok in _WORD_RE.findall(text.lower()):
            t = _stem_cached(tok)
            freqs[t] = freqs.get(t, 0) + 1
    else:
        for tok in _WORD_RE.findall(text.lower()):
            freqs[tok] = freqs.get(tok, 0) + 1
    return freqs


_ANALYZED_FIELDS = [
    StructField("doc_len", IntegerType()),
    StructField("tf_map", MapType(StringType(), IntegerType())),
]


def analyze(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stem: bool = True,
) -> DataFrame:
    """(id, text, ...) → (doc_id, doc_len, tf_map) via one Arrow UDF pass.

    ``doc_len`` counts tokens BEFORE dedup (BM25 |d|); ``tf_map`` is the
    per-doc term→tf dict.  Python ``re`` tokenization is deliberate —
    JVM regex ``\\w`` diverges on Unicode (SURVEY.md §7).
    """
    out_schema = StructType(
        [StructField("doc_id", LongType())] + _ANALYZED_FIELDS
    )

    # a tiny file count must not serialize the UDF pass: fan out when
    # the scan under-parallelizes (no-op at scale, where the input
    # already has >> defaultParallelism splits)
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)

    def analyze_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pdf[text_col]
            tf_maps = [_tf_of(t, stem) for t in texts]
            doc_lens = [
                sum(m.values()) if m else 0 for m in tf_maps
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "doc_len": pd.Series(doc_lens, dtype="int32"),
                    "tf_map": tf_maps,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        analyze_batches, schema=out_schema
    )


def term_doc_tf(analyzed: DataFrame) -> DataFrame:
    """(doc_id, doc_len, tf_map) → (term, doc_id, tf) — narrow explode."""
    return analyzed.select(
        F.explode("tf_map").alias("term", "tf"),
        F.col("doc_id"),
    ).select("term", "doc_id", F.col("tf").cast("long").alias("tf"))


def doc_stats(analyzed: DataFrame) -> DataFrame:
    """(doc_id, doc_len) for every doc, including empty ones."""
    return analyzed.select(
        "doc_id", F.col("doc_len").cast("long").alias("doc_len")
    )


def dictionary(tdf: DataFrame) -> DataFrame:
    """(term, df) — document frequency. Partial aggregation (map-side
    combine) happens automatically for count()."""
    return tdf.groupBy("term").agg(F.count("*").alias("df"))


def corpus_stats(stats: DataFrame) -> DataFrame:
    """Single row (n_docs, avgdl)."""
    return stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
