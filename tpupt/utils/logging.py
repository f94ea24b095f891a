"""Structured logging + profiler glue.

Counterpart of the reference's glog logging (error.cpp Info/Warning/Error
with severity levels) and the SIGPROF sampling profiler (stats.cpp:222
ReportProfilerResults). The TPU inversion of the profiler: device time is
already categorized per-op by XLA, so the "sampling profiler" is
`jax.profiler` writing a TensorBoard/Perfetto trace — `profile_to(dir)`
wraps a render with trace collection, and `annotate(name)` adds host-side
phase markers (TraceAnnotation) that show up alongside the device lanes.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40}
_state = {"level": 20, "file": None, "t0": time.time()}


def set_level(name: str):
    _state["level"] = _LEVELS.get(name.lower(), 20)


def set_logfile(path: str):
    _state["file"] = open(path, "a")


def _emit(level: str, msg: str):
    if _LEVELS[level] < _state["level"]:
        return
    line = (f"[{time.time() - _state['t0']:9.3f}s "
            f"{level.upper():7s}] {msg}")
    out = _state["file"] or sys.stderr
    print(line, file=out, flush=True)


def debug(msg):
    _emit("debug", msg)


def info(msg):
    _emit("info", msg)


def warning(msg):
    _emit("warning", msg)


def error(msg):
    _emit("error", msg)


@contextlib.contextmanager
def profile_to(trace_dir: str):
    """Collect a jax.profiler trace (device + host) into trace_dir —
    view with TensorBoard or ui.perfetto.dev. The per-op device lanes are
    the TPU analog of the reference's per-category SIGPROF histogram."""
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    info(f"profiler: tracing to {trace_dir}")
    with jax.profiler.trace(trace_dir):
        yield
    info(f"profiler: trace written to {trace_dir}")


def annotate(name: str):
    """Host-side phase marker inside a profile_to() region."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(name: str):
    """Host wall-clock phase timer (Timings/* stat rows)."""
    t0 = time.time()
    yield
    info(f"{name}: {time.time() - t0:.2f}s")
