"""Event-time streaming semantics: watermarked windowed aggregation
(unified batch/stream API — the batch run IS the oracle) and the
custom stateful sessionizer (applyInPandasWithState)."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
import pytest

from lean_explore_spark.streaming import windows as W
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """Micro-batch files arrive in EVENT-TIME order (range-partitioned
    by ts, mtimes ascending by range) — the realistic ingest shape;
    rows within a file are unordered.  Random file order would make
    whole files genuinely late (> watermark) and the drops, while
    correct, would leave nothing deterministic to assert."""
    import os
    import time

    base = tmp_path_factory.mktemp("evstream")
    ev = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .where(F.col("user_id") < 20)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    ev.repartitionByRange(6, "ts").write.mode("overwrite").parquet(
        str(base / "events")
    )
    # FileStreamSource orders by modification time: pin mtimes to the
    # range order (part file names are range-ordered)
    parts = sorted((base / "events").glob("part-*.parquet"))
    now = time.time()
    for i, p in enumerate(parts):
        os.utime(p, (now + i, now + i))
    return base


def _read_stream(spark, base: Path):
    static = spark.read.parquet(str(base / "events"))
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(base / "events"))
    )


def test_windowed_counts_stream_equals_batch(spark, event_stream_dir):
    """Complete-mode streaming result of the watermarked windowed agg
    equals the same transformation applied in batch (unified API)."""
    stream = W.windowed_event_counts(_read_stream(spark, event_stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["win_start"], r["win_end"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    batch_events = spark.read.parquet(
        str(event_stream_dir / "events")
    )
    want = {
        (r["win_start"], r["win_end"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in W.windowed_event_counts(batch_events).collect()
    }
    assert got == want and len(want) > 10


def test_windowed_append_mode_emits_closed_windows_once(
    spark, event_stream_dir
):
    """Append mode: every emitted window is final (emitted exactly
    once, value equals batch) and lies at-or-below the terminal
    watermark."""
    stream = W.windowed_event_counts(_read_stream(spark, event_stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("winappend")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM winappend").collect()
    keys = [(r["win_start"], r["win_end"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys)), "window emitted twice"
    batch = {
        (r["win_start"], r["win_end"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in W.windowed_event_counts(
            spark.read.parquet(str(event_stream_dir / "events"))
        ).collect()
    }
    assert rows, "no closed windows emitted"
    for r in rows:
        k = (r["win_start"], r["win_end"], r["event_type"])
        assert batch[k] == (r["n_events"], r["total_value"])


def _true_sessions(spark, base: Path):
    """Per-user sessions from the batch data (python fold — the
    sessionizer's oracle)."""
    rows = (
        spark.read.parquet(str(base / "events"))
        .select("user_id", "ts")
        .orderBy("user_id", "ts")
        .collect()
    )
    sessions: dict = {}
    cur: dict = {}
    for r in rows:
        u, t = int(r["user_id"]), r["ts"]
        if u not in cur:
            cur[u] = [t, t, 1]
        else:
            gap = (t - cur[u][1]).total_seconds()
            if gap > W.SESSION_GAP_SECONDS:
                sessions.setdefault(u, []).append(tuple(cur[u]))
                cur[u] = [t, t, 1]
            else:
                cur[u] = [cur[u][0], t, cur[u][2] + 1]
    open_sessions = {u: tuple(v) for u, v in cur.items()}
    return sessions, open_sessions


def test_stateful_sessionizer_matches_batch_fold(spark, event_stream_dir):
    sess = W.sessionize_stream(_read_stream(spark, event_stream_dir))
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {}
    for r in spark.sql("SELECT * FROM sessions").collect():
        got.setdefault(int(r["user_id"]), []).append(
            (r["session_start"], r["session_end"], int(r["n_events"]))
        )
    closed, open_sessions = _true_sessions(spark, event_stream_dir)
    n_closed = sum(len(v) for v in closed.values())
    assert n_closed > 20, "fixture should produce many gap-closed sessions"
    for u, sessions in closed.items():
        emitted = sorted(got.get(u, []))
        # every gap-closed session must be emitted exactly once with
        # exact (start, end, count); the user's final (open) session
        # may additionally appear if the event-time timeout fired
        for s in sessions:
            assert s in emitted, f"user {u} missing session {s}"
        extra = [e for e in emitted if e not in sessions]
        assert all(e == open_sessions[u] for e in extra), (
            f"user {u} emitted a session that never existed: {extra}"
        )
        assert len(emitted) == len(set(emitted))
