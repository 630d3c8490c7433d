"""North-rule launch path, literally: the documented

    spark-submit --py-files <package.zip> jobs/build_index_job.py ...

command runs in a fresh JVM and produces a byte-identical index to an
in-process build (same input, shards, buckets) — launch mode is not
allowed to affect the bytes (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster")."""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest

from lean_explore_spark.index.builder import IndexBuilder
from tests.conftest import SF_SMOKE

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not shutil.which("spark-submit")
    and not __import__("pathlib").Path(SPARK_SUBMIT).exists(),
    reason="spark-submit not on this machine",
)
def test_spark_submit_pyfiles_build_matches_in_process(spark, tmp_path):
    from lean_explore_spark.pyfiles import build_zip

    out = tmp_path / "idx_submit"
    cmd = [
        SPARK_SUBMIT,
        "--master",
        "local[4]",
        "--py-files",
        build_zip(),
        "/root/repo/jobs/build_index_job.py",
        "--input",
        f"{SF_SMOKE}/documents.parquet",
        "--output",
        str(out),
        "--shards",
        "2",
        "--buckets",
        "4",
        "--cpus",
        "4",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["n_docs"] == 500 and res["docs_per_sec"] > 0

    # same build in-process → identical manifest fingerprints
    ref = tmp_path / "idx_inproc"
    IndexBuilder(spark, str(ref), num_shards=2, num_buckets=4).build(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet"), resume=False
    )

    def fps(d):
        return sorted(
            (int(r["shard"]), int(r["fingerprint"]), int(r["payload_bytes"]))
            for r in spark.read.parquet(str(d / "manifest")).collect()
        )

    assert fps(out) == fps(ref)
