"""URL canonicalization + latest-crawl-per-url dedup: Spark column
arithmetic vs an independent pure-Python reference implementation
(urllib-based), plus crafted spelling-variant cases and the window
dedup's tie rules."""

from __future__ import annotations

import datetime
import random
from urllib.parse import urlsplit

import pyspark.sql.functions as F
import pytest

from lean_explore_spark.operators import webnorm as WN

TRACKING = ("utm_", "fbclid", "gclid")


def py_canonical(url: str) -> str:
    """Independent reference: same 7 documented rules via urllib."""
    u = url.strip()
    u = u.split("#", 1)[0]
    parts = urlsplit(u)
    scheme = parts.scheme.lower()
    auth = parts.netloc.lower()
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[: -len(":80")]
    if scheme == "https" and auth.endswith(":443"):
        auth = auth[: -len(":443")]
    params = [
        p
        for p in (parts.query.split("&") if parts.query else [])
        if p
        and not p.lower().startswith("utm_")
        and not p.lower().startswith("fbclid=")
        and not p.lower().startswith("gclid=")
    ]
    q = "?" + "&".join(sorted(params)) if params else ""
    path = parts.path.rstrip("/") or "/"
    return f"{scheme}://{auth}{path}{q}"


CRAFTED = [
    "https://Example.COM/Path/",
    "https://example.com:443/Path",
    "http://example.com:80/a//",
    "http://example.com:8080/a",  # non-default port kept
    "https://example.com/a?utm_source=x&b=2&a=1",
    "https://example.com/a?b=2&a=1#frag",
    "https://example.com/a?fbclid=abc",
    "https://example.com",
    "  https://example.com/x?gclid=1&z=9&y=8  ",
    "https://example.com/CaseSensitivePath?Q=UPPER",
]


def _rand_url(rnd: random.Random) -> str:
    host = rnd.choice(["Example.com", "www.Test.ORG", "a.b.co:8080",
                       "x.io:443", "y.net:80"])
    scheme = rnd.choice(["http", "https", "HTTP", "HTTPS"])
    path = "/" + "/".join(
        rnd.choice(["a", "B", "c3", "d-d"]) for _ in range(rnd.randrange(4))
    )
    if rnd.random() < 0.4:
        path += "/"
    params = [
        rnd.choice(["a=1", "b=2", "utm_source=t", "utm_x=1", "z=Z",
                    "fbclid=f", "gclid=g", "q=hello"])
        for _ in range(rnd.randrange(4))
    ]
    q = ("?" + "&".join(params)) if params else ""
    frag = "#sec" if rnd.random() < 0.3 else ""
    return f"{scheme}://{host}{path}{q}{frag}"


def test_canonical_url_matches_python_reference(spark):
    rnd = random.Random(13)
    urls = CRAFTED + [_rand_url(rnd) for _ in range(300)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", WN.canonical_url(F.col("url")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == py_canonical(u), u


def test_canonical_url_is_narrow(spark):
    """Zero exchanges: canonicalization must not shuffle."""
    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = (
        WN.canonicalize_urls(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_latest_page_per_url(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    rows = [
        # three spellings of one page, distinct crawl times
        ("https://Example.com/a/", ts(1), "v1"),
        ("https://example.com/a?utm_source=x", ts(3), "v3"),
        ("https://example.com:443/a", ts(2), "v2"),
        # tie on warc_ts → smallest raw url wins
        ("https://b.com/p", ts(5), "b1"),
        ("https://b.com/p/", ts(5), "b2"),
        # unrelated singleton
        ("http://c.org/q?a=1", ts(4), "c1"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    got = {
        r["canonical_url"]: (r["text"], r["warc_ts"])
        for r in WN.latest_page_per_url(df).collect()
    }
    assert got["https://example.com/a"][0] == "v3"  # latest crawl
    assert got["https://b.com/p"][0] == "b1"  # ts tie → url asc
    assert got["http://c.org/q?a=1"][0] == "c1"
    assert len(got) == 3

    # exactly ONE exchange (the window hash partitioning)
    plan = (
        WN.latest_page_per_url(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_latest_per_url_on_generated_pages(spark):
    """On the deterministic pages source (unique urls) the dedup is a
    no-op — same row count, canonical == spelling-normalized url."""
    from lean_explore_spark.sources import pages as P

    pages = P.generate_pages(spark, 200, partitions=4)
    out = WN.latest_page_per_url(pages)
    assert out.count() == 200


# --- host-level ops (r7: host_of / host_stats / filter_hosts) ---

HOST_CASES = [
    ("https://Example.COM/a", "example.com"),
    ("http://user:pw@Site.org:8080/x?q=1", "site.org"),
    ("https://a.net:443/", "a.net"),
    ("HTTP://B.IO", "b.io"),
    ("example.com/path", "example.com"),  # scheme-less: host-first
    ("  https://c.io:80/a#f ", "c.io"),
]


def test_host_of_crafted(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in HOST_CASES], "url string"
    ).select(WN.host_of(F.col("url")).alias("h"))
    assert [r["h"] for r in df.collect()] == [h for _, h in HOST_CASES]


def test_host_stats_counts(spark):
    rows = [
        ("https://A.com/1", "en", "xx"),
        ("https://a.com:443/2", "en", "yyy"),
        ("http://a.com:8080/3", "de", "z"),
        ("https://b.org/1", "en", "wwww"),
    ]
    df = spark.createDataFrame(rows, "url string, lang string, text string")
    got = {
        r["host"]: (r["n_pages"], r["n_langs"], r["total_chars"])
        for r in WN.host_stats(df).collect()
    }
    assert got == {"a.com": (3, 2, 6), "b.org": (1, 1, 4)}


def test_filter_hosts_blocklist(spark):
    rows = [
        ("https://Bad.com/x", "p1"),
        ("http://bad.com:8080/y", "p2"),  # port/case variants blocked too
        ("https://good.com/z", "p3"),
        ("https://sub.bad.com/w", "p4"),  # subdomain NOT blocked (exact host)
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    blk = spark.createDataFrame([("bad.com",)], "host string")
    out = WN.filter_hosts(pages, blk)
    assert sorted(r["text"] for r in out.collect()) == ["p3", "p4"]
    assert out.columns == ["url", "text"]  # original columns preserved

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
