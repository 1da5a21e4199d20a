"""Tracing & phase timing — the framework's observability layer.

Replaces the reference's ad-hoc instrumentation (SURVEY.md §5): std::chrono
around run_step (ilqr_uncertainty_node.cpp:116-124), clock() phase timers in
the costmap (local_costmap.cpp:235-292), omp_get_wtime in the kernel, and
the ``compute_time``/``grid_num`` telemetry topics (local_costmap.cpp:652,
802) — with structured phase timers plus ``jax.profiler`` trace capture for
XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    >>> t = PhaseTimer()
    >>> with t.phase("solve"):
    ...     run()
    >>> t.summary()["solve"]["mean_ms"]

    Note: JAX dispatch is async — wrap device work with
    ``jax.block_until_ready`` inside the phase (or use ``phase(...,
    block=result)``) for honest numbers.
    """

    def __init__(self):
        self._acc: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._acc[name].append(seconds)

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its outputs, record the wall time, return them."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._acc[name].append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self._acc.items():
            n = len(v)
            mean = sum(v) / n
            out[k] = {
                "count": n,
                "total_ms": 1e3 * sum(v),
                "mean_ms": 1e3 * mean,
                "max_ms": 1e3 * max(v),
                "min_ms": 1e3 * min(v),
            }
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for marking regions inside a trace."""
    return jax.profiler.TraceAnnotation(name)
