"""Phase-split profiling of the batched full-stack closed loop (real chip).

Times, at BENCH_FS_BATCH scenarios (default 4096), one plan->act cycle split
into its pipeline phases:
  * costmap_pre   — vmapped corridor geometry + rasterize (+XLA prior when
                    the sample kernel is off)
  * prior_sample  — Pallas window-gather resample of the global map
  * propagation   — banded per-scenario uncertainty propagation kernel
  * costmap_total — build_local_costmap_batched end-to-end
  * solve_mega    — hybrid mega solve with per-scenario maps
  * cycle_total   — one full closed_loop_full_stack_batched cycle

Usage: BENCH_FS_BATCH=4096 python scripts/profile_fullstack.py
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import solver_batched, uncertainty as unc_mod
from cilqr_tpu.ops import costmap as costmap_mod
from cilqr_tpu.ops import gridmap, sample_pallas, uncertainty_pallas
from cilqr_tpu.sim import plant
from cilqr_tpu.sim.example_scenario import example_scenario
from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(os.environ.get("BENCH_FS_BATCH", "4096"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    cp = CostmapParams()
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)

    rng = np.random.default_rng(2)
    gmap = jnp.zeros((256, 256), jnp.float32)
    ggeom = gridmap.make_geom([110.0, -300.0], 0.5, 256, 256, dtype=jnp.float32)
    x0s = jnp.asarray(np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), jnp.float32)
    U0s = jnp.broadcast_to(jnp.zeros((p.horizon, 2), jnp.float32), (B, p.horizon, 2))

    xr, yr = costmap_mod.corridor_center_bounds(cp, plan, n)
    band = uncertainty_pallas.make_band_plan_bounds(
        cp, cp.rows, cp.cols, xr, yr, (cp.sigma_x, cp.sigma_y, cp.sigma_theta)
    )
    print("band plan:", band.bands)

    obs_xyyaw = jnp.full((1, 3), 1e6, jnp.float32)
    sizes = jnp.ones((1, 2), jnp.float32)
    obs_mask = jnp.zeros((1,), jnp.float32)

    # --- phase: costmap pre (vmapped XLA, prior skipped) ---
    pre = jax.jit(
        jax.vmap(
            lambda e: costmap_mod._costmap_pre(
                cp, gmap, ggeom, plan, n, e,
                obs_xyyaw[:, :2], sizes, obs_xyyaw[:, 2], obs_mask,
                skip_prior=True,
            )
        )
    )
    t_pre = timeit(pre, x0s)
    vehicle_map, bbox, corridor, geom = pre(x0s)

    # --- phase: Pallas prior resample ---
    samp = jax.jit(
        lambda g, e: sample_pallas.sample_prior_batched_tpu(
            g, cp.rows, cp.cols, cp.resolution, 0.5, gmap, ggeom,
            e[:, :2], e[:, 3],
        )
    )
    t_samp = timeit(samp, geom, x0s)
    prior = samp(geom, x0s)
    vm = jnp.where(bbox > 90.0, bbox, prior.astype(bbox.dtype))

    # --- phase: banded propagation ---
    prop = jax.jit(
        lambda v, g, y: uncertainty_pallas.propagate_uncertainty_tpu_banded(
            cp, v, g, y, None, band
        )
    )
    yaws = x0s[:, 3]
    t_prop = timeit(prop, vm, geom, yaws)
    umap_arr = prop(vm, geom, yaws)

    # --- phase: costmap total ---
    cmt = jax.jit(
        lambda e: costmap_mod.build_local_costmap_batched(
            cp, gmap, ggeom, plan, n, e,
            obs_xyyaw[:, :2], sizes, obs_xyyaw[:, 2], obs_mask,
            band_plan=band, global_res=0.5,
        )
    )
    t_cm = timeit(cmt, x0s)
    cms = cmt(x0s)

    # --- phase: hybrid mega solve with per-scenario maps ---
    umaps = unc_mod.UncertaintyMap(
        cms.uncertainty_map, cms.geom, cms.origin_xy, cms.origin_yaw
    )
    slv = jax.jit(
        lambda e, u: solver_batched.run_steps_batched(
            p, plan, n, e, u, obstacles, umaps, impl="mega",
            world_batched=True,
        )
    )
    t_slv = timeit(slv, x0s, U0s)

    # --- full cycle ---
    fs = jax.jit(
        lambda x, k: plant.closed_loop_full_stack_batched(
            p, cp, NoiseParams(), gmap, ggeom, plan, n, x, k, 1,
            obstacles=obstacles, band_plan=band, global_res=0.5,
        )
    )
    t_cycle = timeit(fs, x0s, jax.random.key(0), iters=5)

    print(f"B={B}")
    print(f"costmap_pre    {1e3 * t_pre:9.2f} ms")
    print(f"prior_sample   {1e3 * t_samp:9.2f} ms")
    print(f"propagation    {1e3 * t_prop:9.2f} ms")
    print(f"costmap_total  {1e3 * t_cm:9.2f} ms")
    print(f"solve_mega     {1e3 * t_slv:9.2f} ms")
    print(f"cycle_total    {1e3 * t_cycle:9.2f} ms "
          f"({B / t_cycle:.0f} cycles/s)")


if __name__ == "__main__":
    main()
