"""Search perf-event JSONL sink (reference S13,
src/lean_explore/local/search.py:81-147: JSONL append under filelock
with ISO timestamp, status, duration_ms, results_count)."""

from __future__ import annotations

import fcntl
import json
import os
from datetime import datetime, timezone


def log_search_event(
    path: str,
    status: str,
    duration_ms: float,
    results_count: int,
    query: str | None = None,
) -> None:
    """Append one JSON line; flock serializes concurrent writers (the
    reference uses the filelock package for the same purpose)."""
    event = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "status": status,
        "duration_ms": round(duration_ms, 2),
        "results_count": results_count,
    }
    if query is not None:
        event["query"] = query
    line = json.dumps(event) + "\n"
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        os.write(fd, line.encode("utf-8"))
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
