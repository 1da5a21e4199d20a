"""Town02 loop route + chord-aligned plan fit (the `long` scenario path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import reference_path as rp
from cilqr_tpu.sim import plant, scenarios
from cilqr_tpu.utils.params import NoiseParams, SolverParams


def test_loop_plan_geometry():
    plan = scenarios.town02_loop_plan()
    assert plan.shape[0] <= SolverParams().max_global_plan_points
    # every `long` obstacle sits within 5 m of the route (they line the road)
    obs = scenarios.get_scenario("long").obstacles_xyyaw[:, :2]
    d = np.linalg.norm(plan[None, :, :] - obs[:, None, :], axis=-1).min(axis=1)
    assert d.max() < 5.0
    # consecutive spacing is bounded (no jumps at the leg/arc joins)
    seg = np.linalg.norm(np.diff(plan, axis=0), axis=-1)
    assert seg.max() < 2.0 and seg.min() > 0.05


def test_chord_fit_matches_parity_on_straight(global_plan):
    p0 = SolverParams()
    p1 = dataclasses.replace(p0, chord_frame_fit=True)
    plan, n = rp.pad_global_plan(p0, global_plan, dtype=jnp.float64)
    ego = jnp.asarray([100.0, -305.6, 4.0, 0.05])
    lp0 = rp.get_local_plan(p0, plan, n, ego)
    lp1 = rp.get_local_plan(p1, plan, n, ego)
    # same fitted geometry to within the least-squares re-weighting the
    # rotation induces (the chord frame is benign on a y(x) road; sub-cm)
    np.testing.assert_allclose(np.asarray(lp1.sample_y),
                               np.asarray(lp0.sample_y), atol=1e-2)
    np.testing.assert_allclose(np.asarray(lp1.y_fit),
                               np.asarray(lp0.y_fit), atol=1e-2)


def test_chord_fit_tracks_vertical_leg():
    p = dataclasses.replace(SolverParams(), chord_frame_fit=True)
    plan_np = scenarios.town02_loop_plan()
    plan, n = rp.pad_global_plan(p, plan_np, dtype=jnp.float64)
    ego = jnp.asarray([190.14, -250.0, 5.0, np.pi / 2])
    lp = rp.get_local_plan(p, plan, n, ego)
    # sample table runs north along the x ~ 190.14 road
    assert abs(float(jnp.mean(lp.sample_x)) - 190.14) < 0.5
    assert float(jnp.max(lp.sample_y) - jnp.min(lp.sample_y)) > 10.0
    # the parity fit (global y(x) basis) is degenerate here: its sample
    # table spans almost no y — the failure mode the flag exists for
    lp_bad = rp.get_local_plan(SolverParams(), plan, n, ego)
    assert float(jnp.max(lp_bad.sample_y) - jnp.min(lp_bad.sample_y)) < 1.0


def test_closed_loop_turns_corner():
    p = dataclasses.replace(
        SolverParams(), chord_frame_fit=True, horizon=20, max_iterations=8)
    plan_np = scenarios.town02_loop_plan()
    plan, n = rp.pad_global_plan(p, plan_np, dtype=jnp.float64)
    x0 = jnp.asarray([170.0, -306.74, 5.0, 0.0])
    xf, rec = jax.jit(lambda x, k: plant.closed_loop(
        p, NoiseParams(0.05, 0.05, 0.005), plan, n, x, k, 100))(
        x0, jax.random.key(0))
    traj = np.asarray(rec.start_pos)
    assert np.isfinite(traj).all()
    assert traj[:, 0].max() < 195.0       # stays in the corridor
    assert traj[-1, 1] > -295.0           # turned the corner, heading north
    assert abs(float(xf[3]) - np.pi / 2) < 0.3
