"""Measure the remaining propagation-offset levers (VERDICT r4 #5).

Two claims to settle with numbers:

1. "Row-chord column bounds would cut another ~20% of offsets."  The disc
   cut in ``_accumulate`` already bounds the inner row-offset loop to the
   chord of the disc at each column offset (di in [R-m, R+m+1], m =
   floor(sqrt(r^2 - dj^2))), so the walked trip count per band is exactly
   the disc area, not the square.  This script PRINTS the exact
   square/disc/walked trip accounting per band so the claim is settled by
   arithmetic, not argument.

2. The real remaining lever: per-band radii are the band's WORST row, so
   more (narrower) bands fit the disc radius tighter to the lever-arm
   growth.  Walked trips shrink; per-band vectorization waste (sublane
   padding of (band_rows, cols) planes + fixed per-band loop overhead)
   grows.  Measure compiled time at the full-stack geometry for a
   max_bands sweep.

Usage: BENCH_FS_BATCH=4096 python scripts/profile_band_count.py
"""

import dataclasses
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _benchutil import timeit_varied

from cilqr_tpu.ops import costmap as costmap_mod
from cilqr_tpu.ops import gridmap, uncertainty_pallas
from cilqr_tpu.sim.example_scenario import example_scenario
from cilqr_tpu.utils.params import CostmapParams, SolverParams


def walked_trips(plan, cols: int) -> tuple[int, int]:
    """(square_cellvisits, walked_cellvisits) per scenario for a BandPlan —
    each (di, dj) loop body of ``_accumulate`` processes its band's
    (band_rows, cols) plane, so the work metric is trips x band area.  The
    walked count bounds di to the chord of the disc at each dj (exactly
    what the kernel's static di_lo/di_hi bounds do), so walked/square also
    measures how much of the square the existing disc cut already skips."""
    square = 0
    walked = 0
    for (r0, br, R), r_disc in zip(
        plan.bands, plan.disc_radii or (None,) * len(plan.bands)
    ):
        W = 2 * R + 1
        area = br * cols
        square += W * W * area
        if r_disc is None:
            walked += W * W * area
            continue
        r2 = float(r_disc) * float(r_disc)
        for dj in range(W):
            d = dj - R
            if d * d > r2:
                continue
            m = min(R, int(math.floor(math.sqrt(r2 - d * d))))
            walked += (2 * m + 1) * area
    return square, walked


def main():
    B = int(os.environ.get("BENCH_FS_BATCH", "4096"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    cp = CostmapParams()
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)

    xr, yr = costmap_mod.corridor_center_bounds(cp, plan, n)

    def variant(k):
        r = np.random.default_rng(k)
        priors = jnp.asarray(r.uniform(0, 100, (B, cp.rows, cp.cols)), jnp.float32)
        centers = jnp.asarray(
            np.stack([r.uniform(xr[0], xr[1], B), r.uniform(yr[0], yr[1], B)], -1),
            jnp.float32,
        )
        geoms = jax.vmap(
            lambda c: gridmap.make_geom(c, cp.resolution, cp.rows, cp.cols,
                                        dtype=jnp.float32)
        )(centers)
        yaws = jnp.asarray(r.uniform(-3, 3, B), jnp.float32)
        return priors, geoms, yaws

    variants = [variant(k) for k in range(9)]

    ref = None
    for nb in (2, 4, 6, 8, 12, 19):
        band = uncertainty_pallas.make_band_plan_bounds(
            cp, cp.rows, cp.cols, xr, yr,
            (cp.sigma_x, cp.sigma_y, cp.sigma_theta), max_bands=nb,
        )
        sq, wk = walked_trips(band, cp.cols)
        fn = jax.jit(
            lambda v, g, y, b=band: uncertainty_pallas.propagate_uncertainty_tpu_banded(
                cp, v, g, y, None, b
            )
        )
        tc0 = time.perf_counter()
        fn.lower(*variants[0]).compile()
        tc = time.perf_counter() - tc0
        t, out = timeit_varied(fn, variants)
        print(
            f"max_bands={nb:2d}  bands={len(band.bands)}  "
            f"square_cellvisits={sq / 1e6:7.1f}M  walked={wk / 1e6:7.1f}M "
            f"({100.0 * wk / sq:.0f}% of square)  "
            f"time={1e3 * t:7.2f} ms  (compile {tc:.1f}s)"
        )
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


if __name__ == "__main__":
    main()
