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

Every timing iteration uses a DISTINCT ego batch (scripts/_benchutil.py —
the axon terminal dedups identical queued executions; same-input loops can
read ~1000x optimistic).

Usage: BENCH_FS_BATCH=4096 python scripts/profile_fullstack.py
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _benchutil import timeit_varied

from cilqr_tpu.models import solver_batched, uncertainty as unc_mod
from cilqr_tpu.ops import costmap as costmap_mod
from cilqr_tpu.ops import gridmap, sample_pallas, uncertainty_pallas
from cilqr_tpu.sim import plant
from cilqr_tpu.sim.example_scenario import example_scenario
from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams

N_TIMED = 4  # distinct variants per phase (plus warmup); the
# per-variant full-map intermediates are ~0.8 GB each at B=4096 —
# more variants exhaust HBM


def main():
    B = int(os.environ.get("BENCH_FS_BATCH", "4096"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    cp = CostmapParams()
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)

    gmap = jnp.zeros((256, 256), jnp.float32)
    ggeom = gridmap.make_geom([110.0, -300.0], 0.5, 256, 256, dtype=jnp.float32)

    def ego_batch(k):
        r = np.random.default_rng(k)
        return jnp.asarray(
            np.asarray(ego)[None, :] + r.normal(0, 0.3, (B, 4)), jnp.float32
        )

    egos_v = [ego_batch(k) for k in range(N_TIMED + 1)]
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
    t_pre, _ = timeit_varied(pre, [(e,) for e in egos_v])
    vehicle_map, bbox, corridor, geom = pre(egos_v[0])

    # --- phase: Pallas prior resample (per-variant geometries) ---
    # HBM note: holding every pre() output alive (bbox + corridor +
    # vehicle_map per variant) OOMed at B=8192 — keep only the slim
    # (bbox, geom) pair per variant and free the corridor layers as we go.
    pre_slim = []
    for e in egos_v:
        _vm_, bb_, _corr_, g_ = pre(e)
        pre_slim.append((bb_, g_))
        del _vm_, _corr_
    samp = jax.jit(
        lambda g, e: sample_pallas.sample_prior_batched_tpu(
            g, cp.rows, cp.cols, cp.resolution, 0.5, gmap, ggeom,
            e[:, :2], e[:, 3],
        )
    )
    t_samp, _ = timeit_varied(
        samp, [(o[1], e) for o, e in zip(pre_slim, egos_v)]
    )
    prior = samp(geom, egos_v[0])
    vm = jnp.where(bbox > 90.0, bbox, prior.astype(bbox.dtype))

    # --- phase: banded propagation (per-variant frames) ---
    prop = jax.jit(
        lambda v, g, y: uncertainty_pallas.propagate_uncertainty_tpu_banded(
            cp, v, g, y, None, band
        )
    )
    prop_in = []
    while pre_slim:  # consume destructively: one bbox freed per vmx built
        bb_, g_ = pre_slim.pop(0)
        e = egos_v[len(prop_in)]
        pr = samp(g_, e)
        vmx = jnp.where(bb_ > 90.0, bb_, pr.astype(bb_.dtype))
        prop_in.append((vmx, g_, e[:, 3]))
        del bb_, pr
    t_prop, _ = timeit_varied(prop, prop_in)
    del prop_in  # free ~N_TIMED full-map variants before the next phase

    # --- phase: costmap total ---
    cmt = jax.jit(
        lambda e: costmap_mod.build_local_costmap_batched(
            cp, gmap, ggeom, plan, n, e,
            obs_xyyaw[:, :2], sizes, obs_xyyaw[:, 2], obs_mask,
            band_plan=band, global_res=0.5,
        )
    )
    # heavy-output phases: a pipelined group of N_TIMED LocalCostmap /
    # SolveResult outputs (several (B,rows,cols) layers each) OOMs HBM at
    # B>=8192 — cap those groups at warmup+2 variants there
    heavy_v = egos_v[:3] if B >= 8192 else egos_v
    t_cm, _ = timeit_varied(cmt, [(e,) for e in heavy_v])
    cms = cmt(egos_v[0])

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
    t_slv, _ = timeit_varied(slv, [(e, U0s) for e in heavy_v])

    # --- full cycle ---
    fs = jax.jit(
        lambda x, k: plant.closed_loop_full_stack_batched(
            p, cp, NoiseParams(), gmap, ggeom, plan, n, x, k, 1,
            obstacles=obstacles, band_plan=band, global_res=0.5,
        )
    )
    t_cycle, _ = timeit_varied(
        fs, [(e, jax.random.key(i)) for i, e in enumerate(heavy_v)]
    )

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
