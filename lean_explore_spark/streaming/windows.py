"""Event-time streaming: watermarked windowed aggregation + a custom
stateful sessionizer (``applyInPandasWithState``).

SURVEY §2.10 covers the reference's batch re-sync; this module covers
the two Structured-Streaming shapes the 100 TB brief calls out
beyond it:

* ``windowed_event_counts`` — sliding/tumbling event-time windows with
  a watermark: late rows inside the watermark still update their
  window; rows later than the watermark are dropped, and append-mode
  output emits each window exactly once when the watermark passes it.
  At scale this is the canonical "crawl-rate per host per minute"
  rollup: partial aggregation before the shuffle, state bounded by
  (watermark / slide) windows per key.

* ``sessionize_stream`` — per-user session assembly as a CUSTOM
  stateful operator (``applyInPandasWithState``): state = the open
  session (start, last_ts, count); an event with a gap > timeout
  closes the session and emits it.  Timed-out state flushes via
  ``GroupStateTimeout.EventTimeTimeout`` against the watermark, so at
  10^12 events the state store holds one small row per ACTIVE user,
  not history.

Both run on any streaming source; tests drive them with a file source
over the ``events`` test table and check the results against the
equivalent batch computation (the exactly-once / late-data semantics
are what's under test, not the arithmetic).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window, event_type, n_events, total_value) with an event-time
    watermark — works identically on a batch or streaming ``events``
    relation (Spark's unified API; tests exploit that for the oracle).
    """
    w = (
        F.window("ts", window, slide)
        if slide
        else F.window("ts", window)
    )
    # watermarks require TIMESTAMP (not NTZ); the UTC-pinned session
    # makes this cast a stable bijection
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def _sessionize_group(
    key: Tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-user stateful kernel: fold this batch's events (sorted by
    event time) into the open session; emit every session closed by a
    gap > SESSION_GAP_SECONDS, keep the still-open one in state."""
    user_id = int(key[0])
    gap_ns = SESSION_GAP_SECONDS * 1_000_000_000  # pandas int64 = ns

    def emit(rows):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(s) for s, _, _ in rows],
                "session_end": [pd.Timestamp(e) for _, e, _ in rows],
                "n_events": [int(c) for _, _, c in rows],
            }
        )

    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
        return

    parts = [pdf["ts"].astype("int64") for pdf in pdfs]
    times = pd.concat(parts).sort_values().to_numpy()

    start, last, n = state.get if state.exists else (None, None, 0)
    out = []
    for t in times:
        t = int(t)
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_ns:
            out.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last = int(max(last, t))
            n += 1
    state.update((int(start), int(last), int(n)))
    # time out the open session once the event-time watermark passes
    # its gap horizon (timeout timestamp is epoch millis)
    state.setTimeoutTimestamp(last // 1_000_000 + SESSION_GAP_SECONDS * 1000)
    if out:
        yield emit(out)


def sessionize_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming per-user sessionization via applyInPandasWithState.

    Emits CLOSED sessions (gap-closed in-batch, or watermark-timed-out
    between batches).  State per user is one (start, last, n) row.

    In-order-ingest assumption (ADVICE r2): events are folded into the
    OPEN session as they arrive, so a cross-batch late event (within
    the watermark but older than an already-closed in-batch gap) can
    merge into the wrong session vs the batch fold.  Inputs delivered
    in event-time order per user (the fixture pins file mtimes for
    exactly this) match the batch oracle exactly; for disordered
    feeds, buffer events in state until the watermark passes before
    closing — at the cost of O(events-in-gap-window) state per user
    instead of one triple."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
