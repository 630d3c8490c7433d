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


_BUF_STATE_SCHEMA = "buf array<long>"


def _sessionize_group_buffered(
    key: Tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    max_buffered: int | None = None,
) -> Iterable[pd.DataFrame]:
    """Out-of-order-safe kernel (r3 VERDICT #6): buffer event times in
    state and close a session only once the event-time watermark has
    passed its end + gap — at that point no acceptable future event
    (all have ts ≥ watermark) can extend or merge it, so the emitted
    sessions equal the batch fold REGARDLESS of arrival order.  State
    is O(events within the gap/watermark horizon) per user instead of
    one triple — the documented price of disorder tolerance.

    ``max_buffered`` caps that state per user (r4 VERDICT #6): when an
    adversarial single-key flood pushes the buffer past the cap, the
    OLDEST sessions are closed early until it fits.  No event is ever
    dropped — every event is emitted in exactly one session — but a
    late event arriving after its session was force-closed starts a
    new session, so a flooded key's sessions may SPLIT relative to the
    batch fold.  Below the cap, parity is exact."""
    user_id = int(key[0])
    gap_ns = SESSION_GAP_SECONDS * 1_000_000_000

    def emit(rows):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(s) for s, _, _ in rows],
                "session_end": [pd.Timestamp(e) for _, e, _ in rows],
                "n_events": [int(c) for _, _, c in rows],
            }
        )

    buf = list(state.get[0]) if state.exists else []
    for pdf in pdfs:  # empty iterator on a pure timeout invocation
        buf.extend(int(t) for t in pdf["ts"].astype("int64"))
    buf.sort()
    if not buf:
        if state.exists:
            state.remove()
        return

    wm_ns = state.getCurrentWatermarkMs() * 1_000_000
    sessions = []  # (start, last, n) over the full buffer
    start = last = buf[0]
    n = 0
    for t in buf:
        if t - last > gap_ns:
            sessions.append((start, last, n))
            start, n = t, 0
        last = t
        n += 1
    sessions.append((start, last, n))

    closed = [s for s in sessions if s[1] + gap_ns < wm_ns]
    if max_buffered is not None:
        # overflow: force-close oldest sessions until the buffer fits
        # (sessions are in time order; closed is always a prefix)
        i = len(closed)
        buffered = len(buf) - sum(s[2] for s in closed)
        while buffered > max_buffered and i < len(sessions):
            closed.append(sessions[i])
            buffered -= sessions[i][2]
            i += 1
    keep_from = sum(s[2] for s in closed)  # buf is sorted: prefix drop
    remaining = buf[keep_from:]
    if remaining:
        state.update((remaining,))
        # wake when the watermark passes the last event's gap horizon
        # (+1ms: the timestamp must exceed the current watermark)
        state.setTimeoutTimestamp(
            remaining[-1] // 1_000_000 + SESSION_GAP_SECONDS * 1000 + 1
        )
    elif state.exists:
        state.remove()
    if closed:
        yield emit(closed)


def sessionize_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    ordered: bool = True,
    max_buffered: int | None = None,
) -> DataFrame:
    """Streaming per-user sessionization via applyInPandasWithState.

    Emits CLOSED sessions.  Two kernels:

    * ``ordered=True`` (default): state per user is ONE (start, last,
      n) triple; sessions close on an in-batch gap or a watermark
      timeout.  In-order-ingest assumption (ADVICE r2): events fold
      into the open session as they arrive, so a cross-batch late
      event (inside the watermark but older than an already-closed
      gap) can land in the wrong session vs the batch fold.  Right
      for per-user-ordered feeds (e.g. Kafka keyed by user).
    * ``ordered=False``: watermark-buffered close — events are held in
      state until the watermark passes their session's gap horizon,
      so emissions match the batch fold under ANY arrival order, at
      O(events in the watermark horizon) state per user
      (tests/test_streaming_windows.py drives it with shuffled file
      order against the batch oracle).  ``max_buffered`` caps the
      per-user buffer; overflow force-closes oldest sessions early
      (no drops, possible splits — kernel docstring).  Ignored for
      the ordered kernel, whose state is O(1) per user already."""
    from functools import partial

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    kernel = (
        _sessionize_group
        if ordered
        else partial(_sessionize_group_buffered, max_buffered=max_buffered)
    )
    schema = _STATE_SCHEMA if ordered else _BUF_STATE_SCHEMA
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            kernel,
            outputStructType=SESSION_SCHEMA,
            stateStructType=schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
