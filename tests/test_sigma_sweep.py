"""The paper's core claim, measured: uncertainty-aware CILQR beats the
blind baseline under localization noise.

Reference experiment design: batch_dataprocess.py:459-475 compares CILQR vs
CILQR_Base over noise set by Experiment.launch:7-12 (and rqt_reconfigure
matching the costmap sigmas to it).  The ``gauntlet`` scenario
(sim/scenarios.make_gauntlet) makes the claim falsifiable: parked cars force
a squeeze toward a wall only the costmap can see, so under noise the
uncertainty term is the difference between grazing the wall and clearing it.

These are CPU-sized versions (coarse 0.4 m costmap with the same 30x21 m
coverage as the production 152x104@0.2 grid, horizon 24) of the production
TPU sweep recorded in docs/BASELINES.md (`python -m cilqr_tpu sweep`).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.ops import gridmap
from cilqr_tpu.sim import scenarios, sweep
from cilqr_tpu.utils.params import CostmapParams, SolverParams

SIGMA_HI = 0.5


@pytest.fixture(scope="module")
def sweep_setup():
    p = dataclasses.replace(
        SolverParams(), horizon=24, max_iterations=10, w_uncertainty=5.0)
    cp = dataclasses.replace(
        CostmapParams(), resolution=0.4, rows=76, cols=52, window_radius=6)
    sc = scenarios.make_gauntlet()
    gm = jnp.zeros((128, 128), jnp.float32)
    gg = gridmap.make_geom([110.0, -300.0], 0.5, 128, 128, dtype=jnp.float32)
    return p, cp, sc, gm, gg


def _run(setup, sigmas, algorithms, n_runs=10):
    p, cp, sc, gm, gg = setup
    return sweep.run_sigma_sweep(
        sigmas, algorithms=algorithms, scenario=sc, p=p, cp=cp,
        global_map=gm, global_geom=gg, n_runs=n_runs, n_cycles=140,
        seed=0, use_pallas=False, sigma_theta_ratio=0.2,
    )


def test_cilqr_beats_base_under_noise(sweep_setup):
    rows = _run(sweep_setup, [0.0, SIGMA_HI], ("cilqr", "cilqr_base"))
    by = {(r["sigma_xy"], r["algorithm"]): r for r in rows}

    # sigma = 0: the term is inert (no smear), both variants are safe and
    # drive the same line
    assert by[(0.0, "cilqr")]["collision_runs"] == 0
    assert by[(0.0, "cilqr_base")]["collision_runs"] == 0
    np.testing.assert_allclose(
        by[(0.0, "cilqr")]["min_wall_clearance"],
        by[(0.0, "cilqr_base")]["min_wall_clearance"], atol=0.02)

    # sigma high: the blind baseline hits the wall it cannot see; the
    # uncertainty-aware planner's collision count is strictly lower and its
    # wall margin strictly larger
    aware = by[(SIGMA_HI, "cilqr")]
    blind = by[(SIGMA_HI, "cilqr_base")]
    assert blind["collision_runs"] >= 3, blind
    assert aware["collision_runs"] < blind["collision_runs"], (aware, blind)
    assert aware["collision_runs"] <= 1, aware
    assert (aware["mean_min_wall_clearance"]
            > blind["mean_min_wall_clearance"] + 0.1), (aware, blind)


def test_frenet_propagation_differs_from_origin(sweep_setup):
    rows = _run(
        sweep_setup, [SIGMA_HI], ("frenet_origin", "frenet_propagation"))
    by = {r["algorithm"]: r for r in rows}
    orig = by["frenet_origin"]
    prop = by["frenet_propagation"]
    # the propagation ablation consumes the costmap and measurably stands
    # further off the wall (Frenet/readme.md ablation axis)
    assert prop["min_wall_clearance"] > orig["min_wall_clearance"] + 0.1, (
        orig, prop)
    assert prop["collision_runs"] <= orig["collision_runs"]
