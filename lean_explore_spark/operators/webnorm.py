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


def host_of(url: Column) -> Column:
    """Lowercased host of a URL: the authority minus userinfo and
    port.  Pure per-row JVM regexp (codegen, no Python, no shuffle).

    No public-suffix registrable-domain reduction — a PSL snapshot is
    external data this sandbox excludes; at scale, swap the last step
    for a broadcast join against the PSL table.  Scheme-less strings
    are treated as host-first (``example.com/x`` → ``example.com``),
    matching curl/blocklist conventions.
    """
    after = F.regexp_replace(
        F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""
    )
    auth = F.regexp_extract(after, r"^([^/?#]*)", 1)
    auth = F.regexp_replace(auth, r"^[^@/]*@", "")  # userinfo
    return F.lower(F.regexp_replace(auth, r":[0-9]*$", ""))  # port


def host_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host corpus priors: (host, n_pages, n_langs, total_chars).

    The host-level view is how web pipelines apply domain quality
    priors (RefinedWeb §3.1 URL/host filtering; Dolma's per-domain
    stats): hosts with few pages of one language and sane sizes are
    kept, link farms and mirrors surface as outliers.  ONE
    partial-aggregated groupBy(host) — count / count-distinct-lang /
    sum all combine map-side; host cardinality ≪ page cardinality so
    the shuffle is tiny and skew-free at any corpus size.
    """
    return (
        pages.select(
            host_of(F.col(url_col)).alias("host"),
            "lang",
            F.length("text").cast("long").alias("_chars"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum("_chars").cast("long").alias("total_chars"),
        )
    )


def filter_hosts(
    pages: DataFrame, blocked_hosts: DataFrame, url_col: str = "url"
) -> DataFrame:
    """UT1-style host blocklist: drop pages whose host is listed.

    ``blocked_hosts`` has one column ``host`` (lowercased, as
    ``host_of`` produces).  Blocklists are small (UT1 adult ≈ 4M
    rows, a few hundred MB) → ONE BroadcastHashJoin LEFT ANTI, zero
    shuffle of the corpus; pages keep their original columns.
    """
    blk = F.broadcast(
        blocked_hosts.select(F.col("host").alias("_blk_host")).distinct()
    )
    return (
        pages.withColumn("_host", host_of(F.col(url_col)))
        .join(blk, F.col("_host") == F.col("_blk_host"), "left_anti")
        .drop("_host")
    )


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
