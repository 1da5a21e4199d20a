"""A/B: banded propagation with fori_loop row offsets vs static unroll.

Uses the real full-stack band plan (corridor-derived center bounds) and
VARIED inputs per timing iteration (the axon terminal dedups identical
queued executions).

Usage: BENCH_FS_BATCH=4096 python scripts/profile_prop_unroll.py
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _benchutil import timeit_varied

from cilqr_tpu.models import solver  # noqa: F401 (warm import path)
from cilqr_tpu.ops import costmap as costmap_mod
from cilqr_tpu.ops import gridmap, uncertainty_pallas
from cilqr_tpu.sim.example_scenario import example_scenario
from cilqr_tpu.utils.params import CostmapParams, SolverParams


def main():
    B = int(os.environ.get("BENCH_FS_BATCH", "4096"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    cp = CostmapParams()
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)
    rng = np.random.default_rng(2)

    xr, yr = costmap_mod.corridor_center_bounds(cp, plan, n)
    band = uncertainty_pallas.make_band_plan_bounds(
        cp, cp.rows, cp.cols, xr, yr, (cp.sigma_x, cp.sigma_y, cp.sigma_theta)
    )
    print("bands:", band.bands, "disc:", tuple(round(r, 2) for r in band.disc_radii))

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

    variants = [variant(k) for k in range(9)]  # 1 warm + 8 distinct timed

    ref = None
    for unroll in (False, True):
        fn = jax.jit(
            lambda v, g, y, u=unroll: uncertainty_pallas.propagate_uncertainty_tpu_banded(
                cp, v, g, y, None, band, unroll_rows=u
            )
        )
        tc0 = time.perf_counter()
        fn.lower(*variants[0]).compile()
        tc = time.perf_counter() - tc0
        t, out = timeit_varied(fn, variants)
        print(f"unroll={unroll}: {1e3 * t:8.2f} ms  (compile {tc:.1f}s)")
        if unroll and ref is not None:
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
            print("bit-identical to fori path")
        else:
            ref = out


if __name__ == "__main__":
    main()
