"""NRB-RRT node-budget sensitivity (VERDICT r2 weak #6 / next #9).

The NRB-RRT baseline's safety column in docs/BASELINES.md depends on the
fixed tree budget ``NRBParams.n_iters`` (a shallow tree from a bad
deterministic seed is the documented cause of its residual slalom
collisions).  This script runs the dense slalom scenarios at
n_iters in {64, 96, 192} x 10 seeded runs and prints a markdown table of
collision-run counts + min obstacle distance, so the budget sensitivity is
measured rather than asserted.

    python scripts/nrb_budget_sensitivity.py          # table on stdout
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from cilqr_tpu.models import nrb_rrt
    from cilqr_tpu.sim import runner, scenarios
    from cilqr_tpu.utils.params import NoiseParams, SolverParams

    p = SolverParams()  # horizon 40 production default
    noise = NoiseParams()  # Experiment.launch defaults (0.16/0.16/0.017)
    budgets = (64, 96, 192)
    names = ("success1", "success2", "success3")
    n_runs, n_cycles = 10, 140

    print("| scenario | n_iters | collision_runs | min_obstacle_distance | velocity_mean |")
    print("|---|---|---|---|---|")
    for name in names:
        sc = scenarios.get_scenario(name)
        plan = scenarios.plan_for(name)
        for n_iters in budgets:
            nrbp = dataclasses.replace(nrb_rrt.NRBParams(), n_iters=n_iters)
            _, rows = runner.run_experiment_batch(
                p, noise, plan, np.array(sc.start), n_cycles, sc,
                n_runs=n_runs, seed=0, dtype=jnp.float32,
                algorithm="nrb_rrt", nrb_params=nrbp,
            )
            coll = sum(1 for r in rows if r["collisions"] > 0)
            dmin = min(r["distance_to_obstacles_min"] for r in rows)
            vmean = float(np.mean([r["velocity_mean"] for r in rows]))
            print(f"| {name} | {n_iters} | {coll}/{n_runs} | "
                  f"{dmin:.3f} | {vmean:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
