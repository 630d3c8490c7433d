"""JSONL scan/sink parity (SURVEY §2.1 S1/S2/S10): the reference
stream-reads declarations.jsonl / dependencies.jsonl line-by-line
(phase1_tasks.py:306-418, phase4_tasks.py:29-160); Spark equivalent is
spark.read.json with an explicit schema + validity filter."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE


def test_jsonl_roundtrip_and_validity_filter(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    out = tmp_path / "decls_jsonl"
    docs.select("doc_id", "text", "lang").write.mode("overwrite").json(str(out))

    back = (
        spark.read.schema("doc_id long, text string, lang string")
        .json(str(out))
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )
    a = sorted((r["doc_id"], r["text"], r["lang"]) for r in back.collect())
    b = sorted(
        (r["doc_id"], r["text"], r["lang"])
        for r in docs.select("doc_id", "text", "lang").collect()
    )
    assert a == b


def test_jsonl_malformed_lines_dropped(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "{not valid json",
        json.dumps({"doc_id": None, "text": "missing id", "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "fine", "lang": "de"}),
    ]
    p.write_text("\n".join(lines))
    df = (
        spark.read.schema("doc_id long, text string, lang string")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
        .where(F.col("doc_id").isNotNull())
    )
    got = sorted((r["doc_id"], r["text"]) for r in df.collect())
    assert got == [(1, "ok"), (2, "fine")]
