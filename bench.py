"""Benchmark entry point (driver surface) — delegates to cilqr_tpu.benchmark.

Prints ONE JSON line; see cilqr_tpu/benchmark.py for knobs.
"""

import sys

from cilqr_tpu.benchmark import main

if __name__ == "__main__":
    sys.exit(main())
