"""PII scrubbing (operators/pii.py): crafted redaction cases, count
semantics, idempotence, and engine parity of the shared patterns.

The contract-row parity (q_pii_scrub vs _PII_SCRUB_SQL at sf0.01) is
covered by the parametrized gate in test_driver_contract.py; this file
pins the operator's behavior on hand-built edge cases the fixture
corpus can't produce.
"""

from __future__ import annotations

import re

import pytest

from lean_explore_spark.operators import pii

CASES = [
    # (text, scrubbed, n_email, n_ipv4, n_phone)
    (
        "write to a.user+tag@sub.example.co.uk today",
        "write to <EMAIL> today",
        1, 0, 0,
    ),
    (
        "two: x@y.org and z%q@mail-host.net.",
        "two: <EMAIL> and <EMAIL>.",
        2, 0, 0,
    ),
    ("host 192.168.0.1 down", "host <IP> down", 0, 1, 0),
    # \b: digits glued to a word char are NOT an address
    ("v1.2.3.4x and a1.2.3.4", "v1.2.3.4x and a1.2.3.4", 0, 0, 0),
    # leftmost-first: 5 dotted octets -> first four consumed
    ("chain 1.2.3.4.5 end", "chain <IP>.5 end", 0, 1, 0),
    ("call 25-989-741-2988 now", "call <PHONE> now", 0, 0, 1),
    ("dial 415.555.123.4567?", "dial <PHONE>?", 0, 0, 1),
    ("meet at 10 30 100 2000h", "meet at 10 30 100 2000h", 0, 0, 0),
    (
        "ops@corp.io at 10.0.0.7, 408-555-321-9999",
        "<EMAIL> at <IP>, <PHONE>",
        1, 1, 1,
    ),
    ("no pii here", "no pii here", 0, 0, 0),
    ("", "", 0, 0, 0),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(CASES)],
        "doc_id long, text string",
    )
    rows = pii.scrub_pii(df).orderBy("doc_id").collect()
    return rows


def test_crafted_cases(scrubbed):
    for row, (text, want, n_email, n_ipv4, n_phone) in zip(scrubbed, CASES):
        assert row["text"] == want, f"input {text!r}"
        assert (row["n_email"], row["n_ipv4"], row["n_phone"]) == (
            n_email, n_ipv4, n_phone,
        ), f"input {text!r}"


def test_python_re_agrees_with_engine(scrubbed):
    """The module patterns compiled by Python's re (a third engine)
    produce the same scrub — guards the RE2/Java-subset claim."""
    for row, (text, *_rest) in zip(scrubbed, CASES):
        expect = text
        for _name, pat, token in pii.RULES:
            expect = re.sub(pat, token, expect)
        assert row["text"] == expect


def test_idempotent_and_counts_zero_after_scrub(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_r) in enumerate(CASES)],
        "doc_id long, text string",
    )
    once = pii.scrub_pii(df).select("doc_id", "text")
    twice = pii.scrub_pii(once).orderBy("doc_id").collect()
    for row, (text, want, *_r) in zip(twice, CASES):
        assert row["text"] == want, f"not idempotent on {text!r}"
        assert row["n_email"] == row["n_ipv4"] == row["n_phone"] == 0


def test_passthrough_columns_and_schema(spark):
    df = spark.createDataFrame(
        [(1, "en", "mail me@x.io")], "doc_id long, lang string, text string"
    )
    out = pii.scrub_pii(df)
    assert out.columns == ["doc_id", "lang", "text", "n_email", "n_ipv4", "n_phone"]
    row = out.collect()[0]
    assert (row["lang"], row["text"], row["n_email"]) == ("en", "mail <EMAIL>", 1)
    types = dict(out.dtypes)
    assert types["n_email"] == types["n_ipv4"] == types["n_phone"] == "bigint"
