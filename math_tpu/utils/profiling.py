"""Profiling / tracing hooks.

The reference has no built-in profiler (SURVEY.md §5.1 — perf regressions
are caught downstream); here tracing is first-class: thin wrappers over
``jax.profiler`` plus a wall-clock span registry for host-side telemetry.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

_spans: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def span(name: str):
    """Wall-clock span; also emits a TraceAnnotation visible in xprof."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _spans[name].append(time.perf_counter() - t0)


def span_stats() -> Dict[str, dict]:
    out = {}
    for name, times in _spans.items():
        out[name] = {
            "count": len(times),
            "total_s": sum(times),
            "mean_s": sum(times) / len(times),
        }
    return out


def reset_spans():
    _spans.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture an xprof device trace (open with TensorBoard / xprof)."""
    from math_tpu.config import get_config

    log_dir = log_dir or get_config().profile_dir or "/tmp/math_tpu_trace"
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
