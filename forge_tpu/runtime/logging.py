"""Structured event logging: JSON-lines telemetry for serving deployments.

The reference logs free-text to stdout; a production serving stack wants
machine-readable events (SURVEY §5 metrics/logging). One line per event to
`logs/events.jsonl` (rotated by size) and optionally stdout:

  {"ts": ..., "event": "generation", "duration_s": 1.2, "sampler": "...", ...}

Wired from the API layer (request start/end, errors) and process_images
(phase timings). Zero deps, thread-safe, no-op until `configure` or the
first `log_event` creates the default sink.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Optional

_LOCK = threading.Lock()
_PATH: Optional[str] = None
_ECHO = False
_MAX_BYTES = 16 << 20
_ENABLED = True


def configure(path: str = "logs/events.jsonl", echo: bool = False,
              max_bytes: int = 16 << 20, enabled: bool = True):
    global _PATH, _ECHO, _MAX_BYTES, _ENABLED
    _PATH, _ECHO, _MAX_BYTES, _ENABLED = path, echo, max_bytes, enabled


def _default(o):
    try:
        return float(o)
    except Exception:
        return str(o)


def log_event(event: str, **fields: Any):
    """Append one JSON line; never raises (logging must not break serving)."""
    if not _ENABLED:
        return
    global _PATH
    rec = {"ts": round(time.time(), 3), "event": event, **fields}
    try:
        line = json.dumps(rec, default=_default)
    except Exception:
        return
    with _LOCK:
        if _PATH is None:
            _PATH = "logs/events.jsonl"
        try:
            os.makedirs(os.path.dirname(_PATH) or ".", exist_ok=True)
            if os.path.exists(_PATH) and os.path.getsize(_PATH) > _MAX_BYTES:
                os.replace(_PATH, _PATH + ".1")  # single-file rotation
            with open(_PATH, "a", encoding="utf-8") as f:
                f.write(line + "\n")
        except OSError:
            pass
        if _ECHO:
            print(line)
