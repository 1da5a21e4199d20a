"""NRB-RRT baseline: risk-bounded tree growth, DR margin behavior, and the
closed-loop comparison-axis integration (batch_dataprocess.py:458)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import nrb_rrt, obstacles as obs_mod
from cilqr_tpu.models import reference_path as rp
from cilqr_tpu.sim import plant, runner, scenarios
from cilqr_tpu.utils.params import NoiseParams, SolverParams
import pytest


def _world(p, global_plan, obs_x=112.0, obs_y=-305.8):
    plan_xy, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    ob = obs_mod.make_static_obstacles(
        p, np.array([[obs_x, obs_y]]), np.array([[4.5, 2.0]]),
        np.array([0.05]), dtype=jnp.float64)
    return plan_xy, n, ob


def _min_obstacle_distance(X, obs_xy):
    return float(np.min(np.linalg.norm(np.asarray(X[:, :2]) - obs_xy, axis=1)))


def test_plans_forward_and_clear(ego_state, global_plan):
    p = dataclasses.replace(SolverParams(), horizon=30)
    plan_xy, n, ob = _world(p, global_plan)
    np_ = nrb_rrt.NRBParams()
    sig = jnp.asarray([0.16, 0.16, 0.017])

    res = jax.jit(nrb_rrt.plan_step, static_argnums=(0, 1))(
        p, np_, plan_xy, n, jnp.asarray(ego_state), ob, None, sig)
    assert float(res.lamb) == 1.0          # admissible path found
    assert np.isfinite(np.asarray(res.X)).all()
    assert float(res.X[-1, 0]) > float(res.X[0, 0]) + 1.0   # progress
    # the trajectory respects the DR-inflated obstacle set: ego center stays
    # beyond the ellipse semi-major + ego disc (ellipse a=2.25+1.35+margin)
    assert _min_obstacle_distance(res.X, np.array([112.0, -305.8])) > 2.0
    # emitted controls are actuation-feasible (yaw rate within the
    # state-dependent bound, acc within the box)
    U = np.asarray(res.U)
    X = np.asarray(res.X)
    assert (U[:, 0] <= p.acc_max + 1e-9).all() and (U[:, 0] >= p.acc_min - 1e-9).all()
    bound = X[:-1, 2] * p.yawrate_gain + 1e-9
    assert (np.abs(U[:, 1]) <= bound + 1e-9).all()


@pytest.mark.slow
def test_deterministic_given_state(ego_state, global_plan):
    """fold_in(ego bits) randomness: identical state -> identical plan."""
    p = dataclasses.replace(SolverParams(), horizon=20)
    plan_xy, n, ob = _world(p, global_plan)
    np_ = nrb_rrt.NRBParams(n_iters=48)
    a = nrb_rrt.plan_step(p, np_, plan_xy, n, jnp.asarray(ego_state), ob)
    b = nrb_rrt.plan_step(p, np_, plan_xy, n, jnp.asarray(ego_state), ob)
    np.testing.assert_array_equal(np.asarray(a.X), np.asarray(b.X))
    c = nrb_rrt.plan_step(
        p, np_, plan_xy, n, jnp.asarray(ego_state) + jnp.asarray([0.01, 0, 0, 0]), ob)
    assert not np.array_equal(np.asarray(a.X), np.asarray(c.X))


def test_risk_bound_blocks_when_tight(ego_state, global_plan):
    """A huge DR margin (tiny alpha, large sigma) must close the corridor:
    no admissible edge -> emergency-brake fallback; a loose bound plans."""
    p = dataclasses.replace(SolverParams(), horizon=20)
    # obstacle ahead on the lane; huge sigma makes the margin the decider
    plan_xy, n, ob = _world(p, global_plan, obs_x=112.0, obs_y=-305.6)
    sig_huge = jnp.asarray([3.0, 3.0, 0.017])

    tight = nrb_rrt.NRBParams(risk_alpha=0.001, n_iters=48)
    loose = nrb_rrt.NRBParams(risk_alpha=0.5, n_iters=48)
    r_tight = nrb_rrt.plan_step(
        p, tight, plan_xy, n, jnp.asarray(ego_state), ob, None, sig_huge)
    r_loose = nrb_rrt.plan_step(
        p, loose, plan_xy, n, jnp.asarray(ego_state), ob, None, sig_huge)
    # kappa(0.001) ~ 31.6 x sigma 4.2 -> every sample inadmissible
    assert float(r_tight.lamb) == 0.0
    # the fallback brakes along the current heading
    assert float(r_tight.X[-1, 2]) < float(ego_state[2])
    # kappa(0.5) = 1: the tree still grows
    assert float(r_loose.lamb) == 1.0
    # and the admitted plan keeps at least the kappa-sigma clearance ordering
    d_loose = _min_obstacle_distance(r_loose.X, np.array([112.0, -305.6]))
    assert d_loose > 2.0


def test_closed_loop_via_runner(ego_state, global_plan):
    """The comparison-axis integration: algorithm='nrb_rrt' through the same
    closed loop as every other planner."""
    p = dataclasses.replace(SolverParams(), horizon=20)
    noise = NoiseParams(0.05, 0.05, 0.005)
    sc = scenarios.Scenario("t", np.array([[115.0, -305.0, 0.0]]))
    ob, obs_xyyaw, obs_size, obs_mask = runner.build_scenario_inputs(
        p, sc, jnp.float64)
    plan_xy, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    step = runner.make_plan_step("nrb_rrt", p, noise, plan_xy, n, obstacles=ob)

    xf, rec = jax.jit(lambda x, k: plant.closed_loop(
        p, noise, plan_xy, n, x, k, 6,
        obstacles=ob, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
        obs_mask=obs_mask, plan_step=step))(
        jnp.asarray(ego_state), jax.random.key(3))
    assert np.isfinite(np.asarray(xf)).all()
    assert float(xf[0]) > float(ego_state[0])
    assert not bool(np.asarray(rec.collided).any())


def test_corridor_band_derivation():
    """nrb_params_for_scenario: gauntlet wall faces minus ego half-width +
    margin; band-less scenarios keep the +-lat_max default."""
    p = SolverParams()
    sc = scenarios.make_gauntlet()
    np_ = runner.nrb_params_for_scenario(p, sc)
    half = p.width / 2.0 + np_.collision_margin
    assert np_.lat_lo == pytest.approx(-2.1 + half)
    assert np_.lat_hi == pytest.approx(3.0)  # 5.0 - half clipped by lat_max
    assert np_.lat_lo > -2.1 and np_.lat_hi < 5.0

    plain = scenarios.Scenario("t", np.array([[115.0, -305.0, 0.0]]))
    np_plain = runner.nrb_params_for_scenario(p, plain)
    assert np_plain.lat_lo is None and np_plain.lat_hi is None


def test_gauntlet_sigma0_plans_inside_corridor(global_plan):
    """Regression (round-3 verdict item 3): at sigma=0 the gauntlet cell
    must not be sampler-infeasible.  With the corridor band the planner
    finds admissible edges and its trajectory stays off both wall faces;
    the old +-3 m sampling aimed most targets inside the lower wall."""
    p = dataclasses.replace(SolverParams(), horizon=30)
    sc = scenarios.make_gauntlet()
    ob, _, _, _ = runner.build_scenario_inputs(p, sc, jnp.float64)
    plan_xy, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    np_ = runner.nrb_params_for_scenario(p, sc)
    sig0 = jnp.asarray([0.0, 0.0, 0.0])
    y_ref = -306.74
    half_w = p.width / 2.0
    for x_ego in (85.0, 95.0, 110.0, 118.0):
        ego = jnp.asarray([x_ego, y_ref, 4.0, 0.0], jnp.float64)
        res = nrb_rrt.plan_step(p, np_, plan_xy, n, ego, ob, None, sig0)
        assert float(res.lamb) == 1.0, f"no admissible path from x={x_ego}"
        lat = np.asarray(res.X[:, 1]) - y_ref
        assert lat.min() > -2.1 + half_w - 1e-6
        assert lat.max() < 5.0 - half_w + 1e-6
