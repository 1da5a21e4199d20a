"""Persistent XLA/Mosaic compilation cache — shared policy.

One implementation serves the CLI (``cilqr_tpu.__main__``) and the test
suite (``tests/conftest.py``) so the cache location and thresholds cannot
drift apart (round-4 review).  The aligned-group propagation kernels the
high-sigma production sweeps need cost ~100 s to compile standalone (and
minutes embedded in the full sweep program); the persistent cache cuts a
warm re-compile to ~20 s (tracing/lowering only — measured through the
axon backend, 100.2 -> 21.3 s across processes) and makes the warm
Pallas-path production sweep a 4.5-minute run (docs/sweep_r4_pallas).

Override the location with ``CILQR_TPU_CACHE_DIR``; set it empty to
disable (e.g. to measure cold-cache behavior).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    cache_dir = os.environ.get(
        "CILQR_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cilqr_tpu",
                     "jax_cache"),
    )
    if not cache_dir:
        return
    try:
        import jax

        # Fail fast on an unwritable cache dir: jax.config.update accepts
        # any string, so a bad CILQR_TPU_CACHE_DIR would otherwise surface
        # only as per-compile JAX warnings / silent cold compiles — the
        # documented 38-min-cold vs 4.5-min-warm sweep expectation would
        # quietly not materialize (advisor r4).
        os.makedirs(cache_dir, exist_ok=True)
        probe = os.path.join(cache_dir, ".writable_probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization; never block a run
        import warnings

        warnings.warn(
            f"cilqr_tpu: persistent compilation cache disabled "
            f"({cache_dir!r}: {e}); compiles will run cold",
            RuntimeWarning,
            stacklevel=2,
        )
