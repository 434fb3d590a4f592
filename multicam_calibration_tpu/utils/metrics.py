"""Structured metrics, stage timers, and profiling hooks.

The reference's observability is tqdm bars and print statements (SURVEY.md
§5: scipy verbose=2 prints, no logging, no profiling). This module gives the
framework production-grade observability with zero overhead when disabled:

- ``metrics.log(event, **fields)`` appends one JSON line to the configured
  sink (``metrics.configure(path)`` or env ``MCC_METRICS=/path/metrics.jsonl``).
- ``metrics.timer("stage")`` context manager records wall-clock per stage
  and logs a ``stage_time`` event.
- ``metrics.profile(logdir)`` wraps ``jax.profiler.trace`` so any pipeline
  region can be captured for TensorBoard/XProf without touching call sites.

Pipeline stages (calibrate, bundle_adjust, detection) call into the global
``metrics`` object; nothing is written unless a sink is configured.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

__all__ = ["Metrics", "metrics"]


class Metrics:
    def __init__(self):
        self._path: Optional[str] = os.environ.get("MCC_METRICS") or None
        self._file = None
        self.stage_times: dict[str, float] = {}

    # -- configuration -----------------------------------------------------
    def configure(self, path: Optional[str]):
        """Set (or clear, with None) the JSONL sink path."""
        if self._file is not None:
            self._file.close()
            self._file = None
        self._path = path
        return self

    @property
    def enabled(self) -> bool:
        return self._path is not None

    # -- events --------------------------------------------------------------
    def log(self, event: str, **fields):
        """Append one structured event; no-op when no sink is configured."""
        if self._path is None:
            return
        if self._file is None:
            self._file = open(self._path, "a", buffering=1)
        rec = {"t": round(time.time(), 6), "event": event}
        rec.update(fields)
        self._file.write(json.dumps(rec, default=_jsonable) + "\n")

    @contextlib.contextmanager
    def timer(self, stage: str, **fields):
        """Record wall-clock of a pipeline stage (always kept in
        ``stage_times``; logged as a ``stage_time`` event when enabled)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stage_times[stage] = self.stage_times.get(stage, 0.0) + dt
            self.log("stage_time", stage=stage, seconds=round(dt, 6), **fields)

    @contextlib.contextmanager
    def profile(self, logdir: str):
        """Capture a jax.profiler trace of the enclosed region."""
        import jax

        with jax.profiler.trace(logdir):
            yield

    def summary(self) -> dict:
        return dict(self.stage_times)


def _jsonable(x):
    try:
        return float(x)
    except Exception:
        return str(x)


#: process-global metrics object used by the pipeline stages.
metrics = Metrics()
