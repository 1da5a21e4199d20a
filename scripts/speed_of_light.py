"""Speed-of-light report for the three hot kernels (BASELINE north star).

Measures device time for (1) the fused LM mega solve kernel, (2) the banded
uncertainty-propagation kernel, (3) the window-gather prior resample kernel,
derives each kernel's analytic FLOPs/HBM-bytes roofline bound
(``cilqr_tpu.utils.roofline``), and prints achieved %-of-speed-of-light and
the binding resource.  Run on the real chip:

    python scripts/speed_of_light.py            # JSON report
    SOL_MD=1 python scripts/speed_of_light.py   # + markdown table

Methodology notes:
* throughput phases use wide batches with varied inputs (the axon terminal
  dedups identical queued executions) and median-of-reps timing;
* the mega figure divides the batched step time by (B x mean LM iterations)
  — per-scenario-per-iteration device time, dispatch amortized to nothing;
* single-map propagation is ALSO reported at batch=1 to show the
  dispatch-bound vs compute-bound split.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_time(fn, args_list, warm=2):
    import jax

    for a in args_list[:warm]:
        jax.block_until_ready(fn(*a))
    ts = []
    for a in args_list:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from cilqr_tpu.ops import costmap as costmap_mod
    from cilqr_tpu.ops import gridmap, sample_pallas, uncertainty_pallas
    from cilqr_tpu.sim.example_scenario import example_scenario
    from cilqr_tpu.models import solver_batched
    from cilqr_tpu.utils import roofline
    from cilqr_tpu.utils.params import CostmapParams, SolverParams

    rng = np.random.default_rng(0)
    reports = []

    # ---- 1. LM mega kernel ------------------------------------------------
    p = dataclasses.replace(SolverParams(), horizon=50)
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)
    B = int(os.environ.get("SOL_BATCH", "32768"))
    U0s = jnp.broadcast_to(U0, (B,) + U0.shape)
    fn = jax.jit(
        lambda e, u: solver_batched.run_steps_batched(
            p, plan, n, e, u, obstacles, unc, impl="mega"
        )
    )
    egos = [
        jnp.asarray(np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), jnp.float32)
        for _ in range(10)
    ]
    # pipelined like bench.py's throughput phase: queue every dispatch, then
    # block once — otherwise each iteration pays the full tunnel RTT and the
    # per-iteration figure overstates device time ~1.7x
    jax.block_until_ready(fn(egos[0], U0s))
    t0 = time.perf_counter()
    outs = [fn(e, U0s) for e in egos]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(egos)
    out = fn(egos[0], U0s)
    mean_iters = float(jnp.mean(out.iterations.astype(jnp.float32)))
    # S/M/K as prep_world sees them for this scenario
    S = p.n_closest_samples
    M = obstacles.pos.shape[0]
    K = -(-(unc.values.shape[0] * unc.values.shape[1]) // 128)
    cost = roofline.mega_iteration_cost(p, S, M, K, has_unc=True)
    per_scen_iter = dt / (B * mean_iters)
    r = cost.report(per_scen_iter)
    r["batch"] = B
    r["mean_lm_iterations"] = round(mean_iters, 2)
    r["note"] = "per scenario per LM iteration (N=50, S=%d, M=%d, K=%d)" % (S, M, K)
    reports.append(r)

    # ---- 2. uncertainty propagation (banded batched, full-stack config) ---
    cp = CostmapParams()  # production 152x104 @ 0.2 m, R=12
    Bp = int(os.environ.get("SOL_PROP_BATCH", "4096"))
    center = (cp.x_position, cp.y_position)
    sigma_hi = (0.16, 0.16, 0.017)
    band_plan = uncertainty_pallas.make_band_plan(
        cp, cp.rows, cp.cols, center, sigma_hi)
    geom1 = gridmap.make_geom(center, cp.resolution, cp.rows, cp.cols,
                              dtype=jnp.float32)
    geomB = jax.tree.map(lambda a: jnp.broadcast_to(a, (Bp,) + a.shape), geom1)
    yaws = jnp.zeros((Bp,), jnp.float32)
    sig = jnp.broadcast_to(jnp.asarray(sigma_hi, jnp.float32), (Bp, 3))
    prop = jax.jit(
        lambda pr: uncertainty_pallas.propagate_uncertainty_tpu_banded(
            cp, pr, geomB, yaws, sig, band_plan
        )
    )
    priors = [
        jnp.asarray(rng.uniform(0, 100, (Bp, cp.rows, cp.cols)), jnp.float32)
        for _ in range(5)
    ]
    dt_p = _median_time(prop, [(pr,) for pr in priors])
    cost_p = roofline.propagation_cost(cp, cp.rows, cp.cols, band_plan=band_plan)
    r = cost_p.report(dt_p / Bp)
    r["batch"] = Bp
    r["note"] = "per map, banded disc-cut plan (bands=%s)" % (band_plan.bands,)
    reports.append(r)

    # single-map full-window variant (shows the dispatch floor)
    prop1 = jax.jit(
        lambda pr: uncertainty_pallas.propagate_uncertainty_tpu(
            cp, pr, geom1, jnp.asarray(0.0, jnp.float32))
    )
    priors1 = [jnp.asarray(rng.uniform(0, 100, (cp.rows, cp.cols)), jnp.float32)
               for _ in range(7)]
    dt_p1 = _median_time(prop1, [(pr,) for pr in priors1])
    cost_p1 = roofline.propagation_cost(cp, cp.rows, cp.cols)
    r = cost_p1.report(dt_p1)
    r["kernel"] = "uncertainty_propagation_B1"
    r["note"] = "single map, full (2R+1)^2 window, one dispatch (tunnel floor included)"
    reports.append(r)

    # ---- 3. prior resample (window gather) --------------------------------
    gH = gW = 256
    g_res = 0.5
    Br = int(os.environ.get("SOL_RES_BATCH", "4096"))
    gmap = jnp.asarray(rng.uniform(0, 100, (gH, gW)), jnp.float32)
    ggeom = gridmap.make_geom([110.0, -300.0], g_res, gH, gW, dtype=jnp.float32)
    egos_r = jnp.asarray(
        np.concatenate(
            [rng.uniform(100, 120, (Br, 1)), rng.uniform(-310, -295, (Br, 1)),
             np.full((Br, 1), 4.0), rng.uniform(-0.3, 0.3, (Br, 1))], axis=1),
        jnp.float32)
    geomB_r = jax.vmap(
        lambda e: gridmap.GridGeom(
            e[:2] + 10.0,
            jnp.asarray(cp.resolution, jnp.float32),
            jnp.asarray([cp.rows * cp.resolution, cp.cols * cp.resolution],
                        jnp.float32),
        )
    )(egos_r)
    res_fn = jax.jit(
        lambda geoms, egs: sample_pallas.sample_prior_batched_tpu(
            geoms, cp.rows, cp.cols, cp.resolution, g_res,
            gmap, ggeom, egs[:, :2], egs[:, 3],
        )
    )
    args_r = []
    for k in range(5):
        e2 = egos_r + 0.01 * k
        g2 = jax.vmap(
            lambda e: gridmap.GridGeom(
                e[:2] + 10.0,
                jnp.asarray(cp.resolution, jnp.float32),
                jnp.asarray([cp.rows * cp.resolution, cp.cols * cp.resolution],
                            jnp.float32),
            )
        )(e2)
        args_r.append((g2, e2))
    dt_r = _median_time(res_fn, args_r)
    cost_r = roofline.resample_cost(cp.rows, cp.cols, cp.resolution, g_res, gH, gW)
    r = cost_r.report(dt_r / Br)
    r["batch"] = Br
    r["note"] = "per map, 256x256@0.5 global -> 152x104@0.2 vehicle"
    reports.append(r)

    print(json.dumps({"device": str(jax.devices()[0]), "kernels": reports}, indent=2))
    if os.environ.get("SOL_MD"):
        print("\n| kernel | t_SoL | measured | % of SoL | bound |")
        print("|---|---|---|---|---|")
        for r in reports:
            print("| %s | %.1f us | %.1f us | %.0f%% | %s |" % (
                r["kernel"], r["t_sol_us"], r["measured_us"],
                r["pct_of_sol"], r["binding_resource"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
