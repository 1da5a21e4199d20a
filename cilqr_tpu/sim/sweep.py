"""Sigma-sweep campaign: measure WHERE the uncertainty term changes outcomes.

The reference's core experimental claim is that uncertainty-aware CILQR
beats the non-aware baseline under localization noise (the entire purpose
of the missing ``Uncertainty.h`` + ``arbitrary_transformation.cu``;
experiment design ``CILQR/src/ilqr/src/batch_dataprocess.py:459-475``, noise
overrides ``ilqr/launch/Experiment.launch:7-12``).  This module reproduces
that claim *measurably*: a grid of noise levels x algorithms on the
``gauntlet`` scenario (chicane between SAT-only walls — see
``sim.scenarios.make_gauntlet``), with the costmap engine's propagation
sigmas matched to the injected noise exactly as the reference experiment
sets both from the same launch/rqt_reconfigure values.

Outputs per (sigma, algorithm): collision-run count, min wall clearance,
min obstacle distance, mean speed — the batch_dataprocess.py metric set
plus the wall-clearance column the walled scenario adds.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from cilqr_tpu.sim import runner, scenarios
from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams

#: The ablation pairs the sweep must separate: uncertainty-aware vs blind
#: CILQR (batch_dataprocess.py:459-463) and the Frenet propagation-vs-origin
#: ablation (Frenet/readme.md modes).
SWEEP_ALGORITHMS = ("cilqr", "cilqr_base", "frenet_origin", "frenet_propagation")


def matched_costmap_params(
    cp: CostmapParams, sigma_xy: float, sigma_theta: float
) -> CostmapParams:
    """Costmap propagation sigmas matched to the injected noise, with the
    fixed window radius sized to cover the worst-case 95% ellipse (the
    dynamic EllipseIterator needs no such choice; the static-window TPU
    kernel does — ops/costmap.required_window_radius)."""
    from cilqr_tpu.ops import costmap as costmap_mod

    cp = dataclasses.replace(
        cp, sigma_x=sigma_xy, sigma_y=sigma_xy, sigma_theta=sigma_theta)
    r = costmap_mod.required_window_radius(cp, cp.rows, cp.cols)
    if r > cp.window_radius:
        cp = dataclasses.replace(cp, window_radius=r)
    return cp


def wall_clearance(rec, scenario: scenarios.Scenario, ego_width: float):
    """Min distance from the ego side to the nearest wall inner face over a
    recorded batch (runs, cycles, 4).  Walls are axis-aligned in the
    gauntlet (yaw 0, along x); clearance = half_width - |y - y_c| - w/2."""
    if scenario.n_walls == 0:
        return None
    sp = np.asarray(rec["start_pos"])  # (runs, T, 4)
    y = sp[..., 1]
    y_lo = scenario.walls_xyyaw[:, 1].min() + scenario.wall_size[1] / 2.0
    y_hi = scenario.walls_xyyaw[:, 1].max() - scenario.wall_size[1] / 2.0
    clear = np.minimum(y_hi - y, y - y_lo) - ego_width / 2.0
    return clear.min(axis=-1)  # (runs,)


def run_sigma_sweep(
    sigmas_xy: Sequence[float],
    algorithms: Sequence[str] = SWEEP_ALGORITHMS,
    scenario: Optional[scenarios.Scenario] = None,
    p: Optional[SolverParams] = None,
    cp: Optional[CostmapParams] = None,
    global_map=None,
    global_geom=None,
    n_runs: int = 10,
    n_cycles: int = 160,
    seed: int = 0,
    sigma_theta_ratio: float = 0.017 / 0.16,
    use_pallas: bool = True,
    dtype=None,
) -> list[dict]:
    """Run the (sigma x algorithm) grid; returns one result row per cell.

    Every algorithm sees the identical noise draws (same seeds) at each
    sigma; costmap-consuming algorithms get per-cycle propagated costmaps
    whose sigmas match the injected noise (matched_costmap_params).
    """
    import jax.numpy as jnp

    from cilqr_tpu.ops import gridmap
    from cilqr_tpu.utils import maps

    if dtype is None:
        dtype = jnp.float32
    sc = scenario if scenario is not None else scenarios.make_gauntlet()
    p = p if p is not None else SolverParams()
    cp = cp if cp is not None else CostmapParams()
    if global_map is None:
        import tempfile

        yaml = maps.make_synthetic_town(tempfile.mkdtemp(prefix="sweep_town_"))
        occ, info = maps.load_map(yaml)
        arr, center = maps.to_gridmap_array(occ, info, unknown_value=100.0)
        global_map = jnp.asarray(arr, dtype)
        global_geom = gridmap.make_geom(
            center, info.resolution, arr.shape[0], arr.shape[1], dtype=dtype)

    plan = scenarios.plan_for(sc.name if sc.name in scenarios._SCENARIOS else "compare")
    x0 = np.array(sc.start)

    rows = []
    for s_xy in sigmas_xy:
        s_th = s_xy * sigma_theta_ratio
        noise = NoiseParams(s_xy, s_xy, s_th)
        cps = matched_costmap_params(cp, s_xy, s_th)
        for algo in algorithms:
            # Only the uncertainty-consuming variants run the per-cycle
            # map_engine pipeline; the blind ablations discard the costmap
            # BY DEFINITION (the CILQR_Base / Frenet-origin nodes never
            # subscribe to it), so skipping the build is faithful and the
            # noise draws stay identical — closed_loop and
            # closed_loop_full_stack split the same per-cycle keys.
            consumes_map = algo in ("cilqr", "frenet_propagation")
            out, run_rows = runner.run_experiment_batch(
                p, noise, plan, x0, n_cycles, sc,
                n_runs=n_runs, seed=seed, dtype=dtype, algorithm=algo,
                costmap_params=cps if consumes_map else None,
                global_map=global_map if consumes_map else None,
                global_geom=global_geom if consumes_map else None,
                use_pallas=use_pallas,
            )
            rec = out["record"]
            get = rec.__getitem__ if isinstance(rec, dict) else lambda k: getattr(rec, k)
            collided = np.asarray(get("collided"))  # (runs, T)
            wc = wall_clearance(rec if isinstance(rec, dict) else rec._asdict(),
                                sc, p.width)
            row = {
                "sigma_xy": float(s_xy),
                "sigma_theta": round(float(s_th), 4),
                "algorithm": algo,
                "collision_runs": int((collided.sum(axis=-1) > 0).sum()),
                "n_runs": n_runs,
                "velocity_mean": round(
                    float(np.mean([r["velocity_mean"] for r in run_rows])), 3),
                "min_obstacle_distance": round(
                    float(np.min([r["distance_to_obstacles_min"]
                                  for r in run_rows])), 3),
                "mean_jerk": round(
                    float(np.mean([r["mean_jerk"] for r in run_rows])), 4),
            }
            if wc is not None:
                row["min_wall_clearance"] = round(float(wc.min()), 3)
                row["mean_min_wall_clearance"] = round(float(wc.mean()), 3)
            rows.append(row)
    return rows


def format_table(rows: list[dict]) -> str:
    """Markdown table for docs/BASELINES.md."""
    cols = ["sigma_xy", "algorithm", "collision_runs", "min_wall_clearance",
            "mean_min_wall_clearance", "min_obstacle_distance",
            "velocity_mean", "mean_jerk"]
    have = [c for c in cols if any(c in r for r in rows)]
    out = ["| " + " | ".join(have) + " |",
           "|" + "|".join("---" for _ in have) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(r.get(c, "")) for c in have) + " |")
    return "\n".join(out)
