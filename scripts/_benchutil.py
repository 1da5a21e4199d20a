"""Shared timing helper for the profiling scripts.

THE TRAP (ROADMAP.md, cilqr_tpu/benchmark.py): the axon terminal dedups
identical queued executions — re-invoking a jitted fn with the same input
buffers in a timing loop can report ~1000x optimistic numbers (0.16 ms was
observed for a 228 ms kernel).  Every iteration here therefore gets its own
distinct input tuple; build one variant per timing iteration.
"""

import time

import jax


def timeit_varied(fn, variants):
    """Median-free mean over len(variants)-1 iterations, one DISTINCT input
    tuple per iteration.  variants[0] warms the jit cache; the rest are each
    dispatched exactly once.  Returns (seconds_per_call, last_output)."""
    if len(variants) < 2:
        raise ValueError("need >= 2 variants: one warmup + >= 1 timed")
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*v) for v in variants[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(variants) - 1), outs[-1]
