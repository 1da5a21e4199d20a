"""10-run experiment grid: vmapped closed-loop batch per scenario."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cilqr_tpu.sim import runner, scenarios
from cilqr_tpu.utils import metrics
from cilqr_tpu.utils.params import NoiseParams, SolverParams


def test_run_experiment_batch(global_plan, tmp_path):
    p = dataclasses.replace(SolverParams(), horizon=10, max_iterations=4)
    sc = scenarios.Scenario("grid-test", np.array([[120.0, -305.0, 0.0]]))
    out, rows = runner.run_experiment_batch(
        p, NoiseParams(0.05, 0.05, 0.005), global_plan,
        np.array([100.0, -305.6, 4.0, 0.05]), n_cycles=6,
        scenario=sc, n_runs=4, dtype=jnp.float64,
    )
    assert out["final_states"].shape == (4, 4)
    assert out["record"].start_pos.shape == (4, 6, 4)
    assert len(rows) == 4
    assert all(r["collisions"] == 0 for r in rows)
    # runs are actually different (independent noise seeds)
    assert np.std(out["final_states"][:, 0]) > 0.0

    metrics.export_csv(rows, str(tmp_path / "grid.csv"))
    header = (tmp_path / "grid.csv").read_text().splitlines()[0]
    assert "velocity_mean" in header and "collisions" in header
