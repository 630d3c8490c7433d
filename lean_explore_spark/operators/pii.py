"""PII scrubbing — redact emails / IPv4 addresses / phone numbers from
a text column, the standard pre-training anonymization stage (BigScience
ROOTS pseudonymization, FineWeb's email/IP anonymization pass).  The
reference engine has no analog; like webnorm this is a web-payload
extension the brief's 100 TB training-data pipeline needs.

Engine-parity contract: every pattern stays inside the
RE2 ∩ java.util.regex common subset — character classes, bounded
repeats, ``\\b`` word boundaries; no lookaround, no backreferences —
so the DuckDB oracle runs the byte-identical patterns (Spark's
``regexp_replace`` is global by default; the oracle passes RE2's
explicit ``'g'`` flag).  Scrub order is pinned email → IPv4 → phone,
and the replacement tokens contain no digits or ``@``, so an earlier
replacement can never manufacture a later match.

Counting semantics: ``n_email``/``n_ipv4``/``n_phone`` are
non-overlapping leftmost match counts on the ORIGINAL text, per
pattern independently (identical leftmost-first semantics in both
engines).  When patterns overlap in the raw text (e.g. a dotted phone
shape inside a dotted numeric run) the scrub is still well-defined by
the fixed order, but per-pattern counts describe the pre-scrub text,
not the tokens emitted — documented, not hidden.

100 TB shape: zero-exchange narrow projection (scan → JVM regexp →
project); column pruning reaches the parquet scan exactly like the
quality batteries (gopher_quality / c4_quality), so this stage is
effectively free next to dedup and runs first in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2- and Java-compatible (no lookaround / backrefs; ASCII classes).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# NANP-ish 2-3 / 3 / 3 / 4 digit groups with -, . or space separators
# (covers the TPC-H c_phone shape '25-989-741-2988').
PHONE_RE = r"\b\d{2,3}[-. ]\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# (count column suffix, pattern, replacement token) — scrub order is
# load-bearing (see module docstring); tokens are digit- and @-free.
RULES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every email / IPv4 / phone occurrence in ``text_col``
    with ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` and report per-pattern
    match counts (``n_email``, ``n_ipv4``, ``n_phone``, longs, counted
    on the original text).

    All other columns pass through unchanged; output column order is
    (passthrough…, text, counts…).  Idempotent: re-scrubbing an
    already-scrubbed corpus finds zero matches (asserted in
    tests/test_pii.py).
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, token in RULES:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    passthrough = [c for c in docs.columns if c != text_col]
    return docs.select(
        *passthrough, scrubbed.alias(text_col), *counts
    )
