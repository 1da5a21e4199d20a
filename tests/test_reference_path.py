"""Local-planner parity: windowing, polyfit evaluation, closest-point table."""

import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import reference_path as rp
from oracle import oracle_cilqr as oracle


def test_closest_point_index(params, global_plan, ego_state):
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    got = int(rp.closest_point_index(plan, n, jnp.asarray(ego_state)))
    want = oracle.closest_point_index(global_plan, ego_state)
    assert got == want


def test_local_plan_fit_matches_oracle(params, global_plan, ego_state):
    """Fitted y values (scaled basis) match the oracle's raw-power lstsq fit."""
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    lp = rp.get_local_plan(params, plan, n, jnp.asarray(ego_state))
    want_plan, want_coeffs = oracle.get_local_plan(params, global_plan, ego_state)
    np.testing.assert_allclose(np.asarray(lp.x_wpts), want_plan[:, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(lp.y_fit), want_plan[:, 1], atol=1e-3)


def test_sample_table_matches_oracle(params, global_plan, ego_state):
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    lp = rp.get_local_plan(params, plan, n, jnp.asarray(ego_state))
    _, coeffs = oracle.get_local_plan(params, global_plan, ego_state)
    w = oracle.get_local_wpts(params, global_plan, ego_state)

    m = params.n_closest_samples
    dx = (w[-1, 0] - w[0, 0]) / m
    want_x = w[0, 0] + dx * np.arange(m)
    want_y = np.polyval(coeffs[::-1], want_x)
    np.testing.assert_allclose(np.asarray(lp.sample_x), want_x, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lp.sample_y), want_y, atol=1e-3)


def test_find_closest_points_matches_oracle(params, global_plan, ego_state):
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    lp = rp.get_local_plan(params, plan, n, jnp.asarray(ego_state))
    _, coeffs = oracle.get_local_plan(params, global_plan, ego_state)
    w = oracle.get_local_wpts(params, global_plan, ego_state)

    rng = np.random.default_rng(3)
    states = np.column_stack(
        [
            rng.uniform(w[0, 0], w[-1, 0], 32),
            rng.uniform(-310, -300, 32),
            rng.uniform(0, 8, 32),
            rng.uniform(-1, 1, 32),
        ]
    )
    got = np.asarray(rp.find_closest_points(lp, jnp.asarray(states)))
    for i in range(32):
        want = oracle.find_closest_point(params, states[i], coeffs, w[:, 0])
        np.testing.assert_allclose(got[i], want, atol=1e-3)


def test_polyfit_scaled_well_conditioned_f32(params, global_plan, ego_state):
    """The scaled-basis fit must stay accurate in float32 at |x| ~ 100 m —
    the raw-power basis of the C++ would be garbage here in f32."""
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float32)
    lp = rp.get_local_plan(params, plan, n, jnp.asarray(ego_state, dtype=jnp.float32))
    want_plan, _ = oracle.get_local_plan(params, global_plan, ego_state)
    np.testing.assert_allclose(np.asarray(lp.y_fit), want_plan[:, 1], atol=2e-3)


def test_exact_end_shrink_matches_numpy_lstsq(global_plan):
    """Near the plan end with k < W points left, the exact_end_shrink fit
    equals a NumPy lstsq on just the remaining points (the reference's
    shrunk-window behavior, LocalPlanner.cpp:51-58); the default repeat-last
    clamp over-weights the final waypoint and differs."""
    import dataclasses

    from cilqr_tpu.utils.params import SolverParams

    p0 = SolverParams()
    p1 = dataclasses.replace(p0, exact_end_shrink=True)
    # non-polynomial curve so least-squares weighting actually matters
    xs = np.linspace(0.0, 119.0, 120)
    plan_np = np.stack([xs, 3.0 * np.sin(xs / 2.2)], axis=1)
    plan, n = rp.pad_global_plan(p0, plan_np, dtype=jnp.float64)
    # ego near the end: 12 < num_of_local_wpts=20 points remain
    ego = jnp.asarray([plan_np[-12, 0], plan_np[-12, 1], 4.0, 0.0])

    lp = rp.get_local_plan(p1, plan, n, ego)
    k = 12
    want = np.polynomial.polynomial.polyfit(
        (plan_np[-k:, 0] - float(lp.x_mid)) / float(lp.x_scale),
        plan_np[-k:, 1], p0.poly_order)
    got_y = np.asarray(lp.y_fit[:k])
    want_y = np.polynomial.polynomial.polyval(
        (plan_np[-k:, 0] - float(lp.x_mid)) / float(lp.x_scale), want)
    np.testing.assert_allclose(got_y, want_y, atol=1e-6)

    # default clamp path gives a different (over-weighted) fit
    lp0 = rp.get_local_plan(p0, plan, n, ego)
    assert np.abs(np.asarray(lp0.y_fit[:k]) - want_y).max() > 1e-3

    # far from the end both paths agree exactly
    ego_mid = jnp.asarray([60.0, 0.0, 4.0, 0.0])
    a = rp.get_local_plan(p0, plan, n, ego_mid)
    b = rp.get_local_plan(p1, plan, n, ego_mid)
    # sub-um agreement (the weighted path carries a 1e-9 ridge)
    np.testing.assert_allclose(np.asarray(a.y_fit), np.asarray(b.y_fit),
                               atol=1e-6)
