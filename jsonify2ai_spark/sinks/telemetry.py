"""K8: driver-side telemetry JSONL log with rotation + activity ring buffer.

Reference semantics (worker/app/telemetry.py:27-241):
- structured JSONL entries {ts, level, subsystem, event, **fields} appended to
  worker.jsonl;
- size-gated rotation, 2 deep: >16 MB -> .jsonl.1 -> .jsonl.2, oldest dropped
  (telemetry.py:108-131);
- last-100 ingest-activity ring buffer (deque(maxlen=100), telemetry.py:46)
  with a get_recent_activity(limit) view (telemetry.py:241).

This is CONTROL-PLANE state — per-driver counters and logs, not data. The
distributed twins of the reference's counters are the streaming aggregations
in streaming/windowed.py (A6); this class covers the part Spark does not:
the operator's own activity log on the driver (or inside foreachBatch).
"""

from __future__ import annotations

import json
import os
from collections import deque
from datetime import datetime, timezone

MAX_LOG_MB_DEFAULT = 16  # reference telemetry.py:41
RING_SIZE = 100  # reference telemetry.py:46


class TelemetryLog:
    """JSONL logger with the reference's rotation and ring-buffer contract."""

    def __init__(self, log_dir: str, max_log_mb: int = MAX_LOG_MB_DEFAULT):
        self.log_dir = log_dir
        self.log_file = os.path.join(log_dir, "worker.jsonl")
        self.max_log_bytes = max_log_mb * 1024 * 1024
        self.activity: deque = deque(maxlen=RING_SIZE)
        self.counters: dict[str, int] = {}
        self.last_error: str | None = None
        os.makedirs(log_dir, exist_ok=True)

    def increment(self, counter_name: str, by: int = 1) -> None:
        self.counters[counter_name] = self.counters.get(counter_name, 0) + by

    def set_error(self, error: str) -> None:
        self.last_error = str(error)

    def log_json(self, event: str, level: str = "info", **fields) -> None:
        entry = {
            "ts": datetime.now(timezone.utc).isoformat(),
            "level": level,
            "subsystem": "worker",
            "event": event,
            **fields,
        }
        self._maybe_rotate()
        with open(self.log_file, "a", encoding="utf-8") as f:
            f.write(json.dumps(entry, ensure_ascii=False) + "\n")

    def record_activity(self, **fields) -> None:
        """Push one activity record into the last-100 ring (and the log)."""
        self.activity.append(dict(fields))
        self.log_json("ingest_activity", **fields)

    def recent_activity(self, limit: int = 50) -> list[dict]:
        """Most-recent-first view of the ring (reference telemetry.py:241)."""
        return list(self.activity)[-limit:][::-1]

    def stats(self) -> dict:
        return {**self.counters, "last_error": self.last_error}

    def _maybe_rotate(self) -> None:
        """Size-gated rotation, 2 deep (reference telemetry.py:108-131):
        current -> .1 -> .2, previous .2 deleted."""
        try:
            if (
                os.path.exists(self.log_file)
                and os.path.getsize(self.log_file) > self.max_log_bytes
            ):
                f1 = self.log_file[: -len(".jsonl")] + ".jsonl.1"
                f2 = self.log_file[: -len(".jsonl")] + ".jsonl.2"
                if os.path.exists(f2):
                    os.unlink(f2)
                if os.path.exists(f1):
                    os.rename(f1, f2)
                os.rename(self.log_file, f1)
        except OSError:
            pass  # logging must never take the pipeline down
