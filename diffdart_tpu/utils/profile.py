"""Tracing/profiling utilities.

Capability parity with dart/common/Stopwatch.hpp + performance::PerformanceLog
(SURVEY.md §5 'Tracing/profiling'): wall-clock stopwatches and a hierarchical
perf log for host-side phases, plus jax-native hooks (named_scope re-export,
jax.profiler trace contexts) for device-side work, and a JSONL metrics logger
(the structured replacement for dtmsg/dtwarn console macros).
"""
from __future__ import annotations

import contextlib
import json
import sys
import time

import jax

named_scope = jax.named_scope  # annotate device-side phases for the profiler


class Stopwatch:
    """Start/stop wall timer (dart::common::Stopwatch parity)."""

    def __init__(self, start: bool = True):
        self._elapsed = 0.0
        self._t0 = time.perf_counter() if start else None

    def start(self):
        if self._t0 is None:
            self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._elapsed += time.perf_counter() - self._t0
            self._t0 = None

    def reset(self):
        self._elapsed, self._t0 = 0.0, None

    def elapsed_s(self) -> float:
        extra = (time.perf_counter() - self._t0) if self._t0 is not None else 0.0
        return self._elapsed + extra


class PerformanceLog:
    """Nested phase timings (performance::PerformanceLog::startRun parity)."""

    def __init__(self, name: str = "root"):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: dict[str, PerformanceLog] = {}

    @contextlib.contextmanager
    def run(self, name: str):
        child = self.children.setdefault(name, PerformanceLog(name))
        t0 = time.perf_counter()
        try:
            yield child
        finally:
            child.total += time.perf_counter() - t0
            child.count += 1

    def report(self, indent: int = 0) -> str:
        lines = []
        if indent:
            lines.append("  " * indent + f"{self.name}: {self.total*1e3:.2f} ms x{self.count}")
        for c in self.children.values():
            lines.append(c.report(indent + 1))
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context — produces an XLA/TPU trace for xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Structured per-iteration metrics -> JSONL stream (stdout or file)."""

    def __init__(self, path: str | None = None):
        self._fh = open(path, "a") if path else sys.stdout
        self._owns = path is not None

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        if self._owns:
            self._fh.close()
