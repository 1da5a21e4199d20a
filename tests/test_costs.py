"""Cost-stack parity: barriers, control/state derivatives, J."""

import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import costs, obstacles as obs_mod, reference_path as rp
from cilqr_tpu.models import uncertainty as unc_mod
from oracle import oracle_cilqr as oracle


def _plan(params, global_plan, ego_state):
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    lp = rp.get_local_plan(params, plan, n, jnp.asarray(ego_state))
    _, coeffs = oracle.get_local_plan(params, global_plan, ego_state)
    w = oracle.get_local_wpts(params, global_plan, ego_state)
    return lp, coeffs, w


def _traj(params, ego_state, seed=4):
    rng = np.random.default_rng(seed)
    U = np.column_stack(
        [rng.uniform(-2, 1.5, params.horizon), rng.uniform(-0.3, 0.3, params.horizon)]
    )
    X = oracle.rollout(params, np.asarray(ego_state), U)
    return X, U


def test_control_cost_matches_oracle(params, ego_state):
    X, U = _traj(params, ego_state)
    got_lu, got_luu = costs.control_cost_derivs(params, jnp.asarray(X), jnp.asarray(U))
    want_lu, want_luu = oracle.control_cost_derivs(params, X, U)
    np.testing.assert_allclose(np.asarray(got_lu), want_lu, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_luu), want_luu, rtol=1e-10, atol=1e-12)


def test_state_cost_matches_oracle(params, global_plan, ego_state):
    lp, coeffs, w = _plan(params, global_plan, ego_state)
    X, _ = _traj(params, ego_state)
    got_lx, got_lxx = costs.state_cost_derivs(params, lp, jnp.asarray(X[: params.horizon]))
    want_lx, want_lxx = oracle.state_cost_derivs(params, X, coeffs, w[:, 0])
    np.testing.assert_allclose(np.asarray(got_lx), want_lx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_lxx), want_lxx, atol=1e-6)


def test_state_cost_with_obstacles(params, global_plan, ego_state):
    lp, coeffs, w = _plan(params, global_plan, ego_state)
    X, _ = _traj(params, ego_state)
    centers = [[112.0, -306.5], [125.0, -304.0]]
    sizes = [[3.63, 1.84], [3.63, 1.84]]
    yaws = [0.0, 0.4]
    ob = obs_mod.make_static_obstacles(params, centers, sizes, yaws, dtype=jnp.float64)

    oracle_obs = []
    for c, s, y in zip(centers, sizes, yaws):
        dims = np.tile(np.asarray(s), (params.horizon, 1))
        pos = np.tile(np.array([c[0], c[1], 0.0, y]), (params.horizon, 1))
        oracle_obs.append((dims, pos))

    got_lx, got_lxx = costs.state_cost_derivs(
        params, lp, jnp.asarray(X[: params.horizon]), obstacles=ob
    )
    want_lx, want_lxx = oracle.state_cost_derivs(params, X, coeffs, w[:, 0], obstacles=oracle_obs)
    np.testing.assert_allclose(np.asarray(got_lx), want_lx, rtol=1e-8, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_lxx), want_lxx, rtol=1e-8, atol=1e-6)


def test_state_cost_with_uncertainty_map(params, global_plan, ego_state):
    lp, coeffs, w = _plan(params, global_plan, ego_state)
    X, _ = _traj(params, ego_state)

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, (152, 104))
    center = np.array([10.0, 0.0])
    origin = np.asarray(ego_state[:2])
    yaw = float(ego_state[3])

    m = unc_mod.make_uncertainty_map(vals, center, 0.2, origin, yaw, dtype=jnp.float64)
    unc = oracle.OracleUncertainty(vals, center, 0.2, origin, yaw)

    got_lx, got_lxx = costs.state_cost_derivs(
        params, lp, jnp.asarray(X[: params.horizon]), unc_map=m
    )
    want_lx, want_lxx = oracle.state_cost_derivs(params, X, coeffs, w[:, 0], unc=unc)
    np.testing.assert_allclose(np.asarray(got_lx), want_lx, rtol=1e-8, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_lxx), want_lxx, rtol=1e-8, atol=1e-6)


def test_total_cost_J(params, global_plan, ego_state):
    lp, coeffs, w = _plan(params, global_plan, ego_state)
    X, U = _traj(params, ego_state)
    got = float(costs.total_cost_J(params, lp, jnp.asarray(X), jnp.asarray(U)))
    want = oracle.get_J(params, X, U, coeffs, w[:, 0])
    np.testing.assert_allclose(got, want, rtol=1e-4)
