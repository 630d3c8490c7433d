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
