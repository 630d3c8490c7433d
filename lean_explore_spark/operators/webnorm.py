"""Web-payload normalization: URL canonicalization + latest-crawl
dedup over the pages table (input_hint shape: url, warc_ts, html,
text, lang).

A Common-Crawl-scale corpus carries the same page under many URL
spellings (case-variant hosts, fragments, tracking params, trailing
slashes, default ports) and under many crawl timestamps.  The
canonical pipeline step is: canonicalize the URL → keep the LATEST
crawl per canonical URL.  The reference's analog is its id-keyed
upsert re-sync (phase1_tasks.py upsert + stale-delete); the web form
keys on the canonical URL instead.

Scale shape: ``canonical_url`` is pure per-row JVM column arithmetic
(regexp/split/filter/sort on short arrays — whole-stage codegen, no
Python, no shuffle); ``latest_page_per_url`` is ONE window exchange
over the canonical key (hash-partitioned, skew-free since canonical
URLs are near-unique).

Canonicalization rules (applied in order; each is standard):
1. trim surrounding whitespace
2. drop the ``#fragment``
3. lowercase scheme and authority (host[:port]) — path/query keep case
4. drop default ports (``:80`` for http, ``:443`` for https)
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``)
6. sort surviving query params (order-insensitive canonical form);
   drop the ``?`` if none survive
7. collapse trailing slashes in the path; empty path → ``/``
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

_TRACKING = ("utm_", "fbclid", "gclid")


def canonical_url(url: Column) -> Column:
    u = F.trim(url)
    u = F.regexp_replace(u, "#.*$", "")  # 2. fragment

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    auth = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))  # 3.
    auth = F.when(  # 4. default ports
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)

    rest = F.regexp_replace(after, r"^[^/?]*", "")  # path[?query]
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(None))

    # 5+6: drop tracking params, sort the rest (single-consumer HOF
    # fold on a short array — the documented legit case)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (
                ~F.lower(p).startswith("utm_")
                & ~F.lower(p).rlike("^(fbclid|gclid)=")
                & (p != "")
            ),
        )
    )
    qcanon = F.when(
        query.isNotNull() & (F.size(params) > 0),
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))

    # 7: trailing slashes; empty path → "/"
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    return F.concat(scheme, F.lit("://"), auth, path, qcanon)


def canonicalize_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canonical_url`` (narrow, zero-shuffle)."""
    return pages.withColumn("canonical_url", canonical_url(F.col(url_col)))


def latest_page_per_url(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per canonical URL: the LATEST crawl (max ``warc_ts``),
    deterministic tie-break on the raw url then remaining columns'
    order via the original url string.  ONE window exchange."""
    withc = canonicalize_urls(pages, url_col)
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("warc_ts").desc(), F.col(url_col).asc()
    )
    return (
        withc.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
