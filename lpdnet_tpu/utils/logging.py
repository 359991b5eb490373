"""Structured JSONL metrics (SURVEY §5 observability row: replaces print +
tensorboardX scalars with diffable JSONL + stdout)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


class MetricsLogger:
    """Append-only JSONL metrics stream + human-readable stdout echo."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 echo: bool = True, stream: Optional[TextIO] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self.echo = echo
        self.stream = stream or sys.stdout
        self._f = open(self.path, "a")

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.echo:
            kv = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {kv}", file=self.stream)
        return rec

    def close(self) -> None:
        self._f.close()
