"""Simulation layer: SAT collision, noise, closed loop, scenarios, runner."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import reference_path as rp
from cilqr_tpu.sim import collision, plant, runner, scenarios
from cilqr_tpu.utils.params import NoiseParams, SolverParams


# ---------------------------------------------------------------- collision
def test_sat_disjoint_and_overlapping():
    a = (0.0, 0.0, 0.0, 4.0, 2.0)
    b_far = (10.0, 0.0, 0.0, 4.0, 2.0)
    b_hit = (3.0, 0.5, 0.3, 4.0, 2.0)
    assert not bool(collision.is_collision(a, b_far))
    assert bool(collision.is_collision(a, b_hit))


def test_sat_rotated_near_miss():
    # two rectangles angled 45deg apart, corners close but disjoint
    a = (0.0, 0.0, 0.0, 4.0, 2.0)
    b = (3.8, 2.8, np.pi / 4, 4.0, 2.0)
    assert _bruteforce_overlap(a, b) is False
    assert not bool(collision.is_collision(a, b))
    b_touch = (2.5, 1.0, np.pi / 4, 4.0, 2.0)
    assert _bruteforce_overlap(a, b_touch) is True
    assert bool(collision.is_collision(a, b_touch))


def test_sat_matches_shapely_style_bruteforce():
    rng = np.random.default_rng(17)
    for _ in range(100):
        v1 = (rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(-3, 3), 4.0, 2.0)
        v2 = (rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(-3, 3), 4.0, 2.0)
        got = bool(collision.is_collision(v1, v2))
        want = _bruteforce_overlap(v1, v2)
        assert got == want, (v1, v2)


def _bruteforce_overlap(v1, v2, n=60):
    """Dense point-sample SAT check (convex): project both onto many axes."""
    c1 = np.asarray(collision.obb_corners(*v1))
    c2 = np.asarray(collision.obb_corners(*v2))
    for th in np.linspace(0, np.pi, n, endpoint=False):
        ax = np.array([np.cos(th), np.sin(th)])
        p1 = c1 @ ax
        p2 = c2 @ ax
        if p1.max() < p2.min() or p2.max() < p1.min():
            return False
    return True


# -------------------------------------------------------------------- noise
def test_noise_injection_statistics(params):
    noise = NoiseParams(sigma_x=0.16, sigma_y=0.16, sigma_theta=0.017)
    state = jnp.asarray([1.0, 2.0, 3.0, 0.5])
    keys = jax.random.split(jax.random.key(0), 4000)
    noisy = jax.vmap(lambda k: plant.inject_noise(noise, k, state))(keys)
    d = np.asarray(noisy) - np.asarray(state)
    assert abs(d[:, 0].std() - 0.16) < 0.02
    assert abs(d[:, 1].std() - 0.16) < 0.02
    assert d[:, 2].std() == 0.0  # v untouched
    assert abs(d[:, 3].std() - 0.017) < 0.003


# ---------------------------------------------------------------- scenarios
def test_scenario_tables():
    assert scenarios.scenario_names() == [
        "compare", "long", "success1", "success2", "success3", "gauntlet",
    ]
    g = scenarios.get_scenario("gauntlet")
    assert g.n_walls == 2 and g.n_obstacles == 2
    s = scenarios.get_scenario("long")
    assert s.n_obstacles == 9
    assert s.obstacle_size == (3.63, 1.84)
    # first obstacle matches the dataprocess.py table (y negated from CARLA)
    np.testing.assert_allclose(s.obstacles_xyyaw[0], [123.32, -306.74, 0.0])


# -------------------------------------------------------------- closed loop
def test_closed_loop_progresses_and_records(params, global_plan):
    p = dataclasses.replace(params, horizon=20, max_iterations=8)
    noise = NoiseParams(0.0, 0.0, 0.0)  # deterministic
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    x0 = jnp.asarray([100.0, -305.6, 4.0, 0.05])

    xf, rec = plant.closed_loop_jit(
        p, noise, plan, n, x0, jax.random.key(0), 30
    )
    assert rec.X.shape == (30, p.horizon + 1, 4)
    assert rec.U.shape == (30, p.horizon, 2)
    # the car must make forward progress along the lane
    assert float(xf[0]) > float(x0[0]) + 5.0
    # tracks the lane: stays within 2 m of the path's y range
    assert -308.5 < float(xf[1]) < -301.0
    assert not bool(np.any(np.asarray(rec.collided)))
    assert np.isfinite(np.asarray(rec.J)).all()


def test_closed_loop_avoids_obstacle(params, global_plan):
    """Obstacle on the lane: ego must swerve, no SAT hit over the run."""
    p = dataclasses.replace(params, horizon=30, max_iterations=10)
    noise = NoiseParams(0.0, 0.0, 0.0)
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    x0 = jnp.asarray([100.0, -305.6, 4.0, 0.05])

    sc = scenarios.Scenario("test", np.array([[115.0, -305.3, 0.0]]))
    ob, obs_xyyaw, obs_size, obs_mask = runner.build_scenario_inputs(p, sc, jnp.float64)
    xf, rec = plant.closed_loop_jit(
        p, noise, plan, n, x0, jax.random.key(1), 50,
        obstacles=ob, obs_xyyaw=obs_xyyaw, obs_size=obs_size, obs_mask=obs_mask,
    )
    assert float(xf[0]) > 112.0  # passed the obstacle's x
    assert not bool(np.any(np.asarray(rec.collided)))
    # actually deviated laterally around the obstacle at closest approach
    traj = np.asarray(rec.start_pos)
    near = np.abs(traj[:, 0] - 115.0) < 4.0
    assert near.any()
    clearance = np.abs(traj[near, 1] - (-305.3))
    assert clearance.min() > 1.0


# ------------------------------------------------------------------ runner
def test_runner_records_planning_time(params, global_plan):
    p = dataclasses.replace(params, horizon=15, max_iterations=5)
    out = runner.run_experiment(
        p, NoiseParams(0.01, 0.01, 0.001), global_plan,
        np.array([100.0, -305.6, 4.0, 0.05]), 5,
        scenario=scenarios.Scenario("t", np.array([[130.0, -305.0, 0.0]])),
        dtype=jnp.float64,
    )
    assert out["planning_time"].shape == (5,)
    assert (out["planning_time"] > 0).all()
    assert out["X"].shape == (5, p.horizon + 1, 4)
    assert out["iterations"].max() <= p.max_iterations


def test_ackermann_semantics():
    cmd = plant.to_ackermann(jnp.asarray(4.0), jnp.asarray([0.5, 0.1]))
    assert float(cmd.speed) == 4.5            # speed + accel
    assert float(cmd.steering_angle) == 0.1   # yaw-rate in the angle field
    assert float(cmd.acceleration) == 0.0
