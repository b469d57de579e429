"""Tracing / profiling hooks (SURVEY.md §5): named phases for the JAX
profiler and a lightweight per-phase wall-clock accumulator for the driver.

Usage:
    with phase("stokes"):
        ...
    start_trace("/tmp/trace")  # Perfetto/XProf dump via jax.profiler
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_timings: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    """Named profiler scope + wall-clock accumulation."""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield
    _timings[name] += time.perf_counter() - t0
    _counts[name] += 1


def phase_report() -> dict:
    return {
        name: {"total_s": round(t, 4), "count": _counts[name]}
        for name, t in sorted(_timings.items())
    }


def reset_phases():
    _timings.clear()
    _counts.clear()


def start_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
