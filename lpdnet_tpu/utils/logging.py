"""Structured JSONL metrics (SURVEY §5 observability row: replaces print +
tensorboardX scalars with diffable JSONL + stdout; an optional tensorboard
scalar mirror keeps literal parity with the reference's SummaryWriter —
SURVEY C19)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


def _scalar_step(fields: Dict[str, Any], fallback: int) -> int:
    for key in ("step", "epoch"):
        if isinstance(fields.get(key), (int, float)):
            return int(fields[key])
    return fallback


class MetricsLogger:
    """Append-only JSONL metrics stream + human-readable stdout echo.

    ``tensorboard=True`` also mirrors numeric fields as tensorboard
    scalars (``<event>/<field>``) under ``<log_dir>/tb`` via tensorboardX
    (silently skipped if the package is unavailable).
    """

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 echo: bool = True, stream: Optional[TextIO] = None,
                 tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self.echo = echo
        self.stream = stream or sys.stdout
        self._f = open(self.path, "a")
        self._tb = None
        self._n = 0
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except ImportError:
                print(
                    "tensorboardX not available; --tensorboard ignored",
                    file=sys.stderr,
                )

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            step = _scalar_step(fields, self._n)
            for k, v in fields.items():
                if k not in ("step", "epoch") and isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{event}/{k}", v, step)
        self._n += 1
        if self.echo:
            kv = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {kv}", file=self.stream)
        return rec

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class NullLogger:
    """Same interface, no side effects — non-primary processes in
    multi-process runs log through this (parallel/multiprocess.py: only
    process 0 writes metrics/checkpoints/reports)."""

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        return {"event": event, **fields}

    def close(self) -> None:
        pass
