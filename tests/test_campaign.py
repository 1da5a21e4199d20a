"""Checkpointed Monte-Carlo campaign driver: resume determinism + shards."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import reference_path as rp
from cilqr_tpu.ops import gridmap
from cilqr_tpu.parallel import batch as pbatch, campaign
from cilqr_tpu.utils.params import CostmapParams, SolverParams
import pytest


def _setup(global_plan):
    p = dataclasses.replace(
        SolverParams(), horizon=8, max_iterations=3,
        max_global_plan_points=128, num_of_local_wpts=8,
    )
    cp = dataclasses.replace(CostmapParams(), rows=16, cols=16, window_radius=4)
    mesh = pbatch.make_mesh()
    prior = jnp.asarray(
        np.random.default_rng(2).uniform(0, 100, (cp.rows, cp.cols)), jnp.float32)
    geom = gridmap.make_geom([5.0, 0.0], cp.resolution, cp.rows, cp.cols,
                             dtype=jnp.float32)
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float32)
    ego = np.array([100.0, -305.6, 4.0, 0.05], np.float32)
    return p, cp, mesh, prior, geom, plan, n, ego


def _run(global_plan, out, n_rounds, resume):
    p, cp, mesh, prior, geom, plan, n, ego = _setup(global_plan)
    return campaign.run_campaign(
        p, cp, mesh, prior, geom, ego[:2], ego[3], plan, n, ego,
        n_rounds=n_rounds, batch=16, out_dir=str(out), seed=7, resume=resume,
    )


def test_campaign_runs_and_merges(global_plan, tmp_path):
    out = _run(global_plan, tmp_path / "a", n_rounds=2, resume=False)
    assert out["rounds"] == 2 and out["solves"] == 32
    assert np.isfinite(out["mean_J"]) and 0.0 <= out["converged_frac"] <= 1.0

    merged = campaign.merge_analysis(str(tmp_path / "a"))
    assert merged["rounds"] == 2 and merged["solves"] == 32
    # stream-merged mean matches the accumulated mean
    np.testing.assert_allclose(merged["mean_J"], out["mean_J"], rtol=1e-6)


@pytest.mark.slow
def test_campaign_resume_is_deterministic(global_plan, tmp_path):
    # uninterrupted 4 rounds
    full = _run(global_plan, tmp_path / "full", n_rounds=4, resume=False)
    # interrupted: 2 rounds, then resume to 4
    _run(global_plan, tmp_path / "int", n_rounds=2, resume=False)
    resumed = _run(global_plan, tmp_path / "int", n_rounds=4, resume=True)

    assert resumed["rounds"] == 4 and resumed["solves"] == full["solves"]
    np.testing.assert_allclose(resumed["mean_J"], full["mean_J"], rtol=1e-6)
    np.testing.assert_allclose(resumed["max_J"], full["max_J"], rtol=1e-6)
    np.testing.assert_allclose(
        resumed["mean_iterations"], full["mean_iterations"], rtol=1e-6)

    # the resumed shard holds all 4 rounds (append mode)
    merged = campaign.merge_analysis(str(tmp_path / "int"))
    assert merged["rounds"] == 4
    assert sorted(r["round"] for r in merged["rows"]) == [0, 1, 2, 3]
    np.testing.assert_allclose(merged["mean_J"], full["mean_J"], rtol=1e-6)
