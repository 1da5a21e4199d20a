"""Metrics parity vs the reference dataprocess.py formulas (NumPy)."""

import jax.numpy as jnp
import numpy as np

from cilqr_tpu.utils import metrics


def _traj(T=50, dt=0.1, seed=19):
    rng = np.random.default_rng(seed)
    t = np.arange(T) * dt
    x = 100 + 4 * t + 0.1 * np.sin(t)
    y = -306 + 0.5 * np.sin(0.5 * t)
    v = 4 + 0.2 * rng.standard_normal(T)
    yaw = 0.05 * np.ones(T)
    return np.stack([x, y, v, yaw], axis=1)


def test_jerks_match_numpy_gradient():
    sp = _traj()
    got = np.asarray(metrics.compute_jerks(jnp.asarray(sp[:, :2]), 0.1))
    # dataprocess.py:117-150 formula
    vx = np.gradient(sp[:, 0], 0.1)
    vy = np.gradient(sp[:, 1], 0.1)
    ax = np.gradient(vx, 0.1)
    ay = np.gradient(vy, 0.1)
    jx = np.gradient(ax, 0.1)
    jy = np.gradient(ay, 0.1)
    want = np.sqrt(jx**2 + jy**2)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_curvature_matches_numpy():
    sp = _traj()
    got = np.asarray(metrics.compute_curvature(jnp.asarray(sp[:, :2])))
    dx = np.gradient(sp[:, 0])
    dy = np.gradient(sp[:, 1])
    ddx = np.gradient(dx)
    ddy = np.gradient(dy)
    num = np.abs(dx * ddy - dy * ddx)
    den = (dx**2 + dy**2) ** 1.5
    want = np.where(den == 0, 0.0, num / den)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_min_obstacle_distance_and_window():
    sp = _traj()
    obs = np.array([[110.0, -306.0], [300.0, 0.0]])
    d = np.asarray(metrics.min_obstacle_distance(jnp.asarray(sp), jnp.asarray(obs)))
    want = np.minimum(
        np.hypot(sp[:, 0] - 110.0, sp[:, 1] + 306.0),
        np.hypot(sp[:, 0] - 300.0, sp[:, 1]),
    )
    np.testing.assert_allclose(d, want, rtol=1e-6)

    m = metrics.spatial_window_mask(jnp.asarray(sp), (100.0, -307.0), (110.0, -305.0))
    want_m = (sp[:, 0] >= 100) & (sp[:, 0] <= 110) & (sp[:, 1] >= -307) & (sp[:, 1] <= -305)
    np.testing.assert_array_equal(np.asarray(m), want_m)


def test_analyze_run_and_batch(tmp_path):
    sp = _traj()
    obs = np.array([[110.0, -306.0]])
    res = metrics.analyze_run(jnp.asarray(sp), jnp.asarray(obs),
                              planning_time=jnp.asarray(np.full(50, 0.01)))
    assert set(res) == {
        "distance_to_obstacles", "mean_jerk", "curvature", "velocity", "planning_time",
    }
    np.testing.assert_allclose(float(res["velocity"].mean), np.mean(sp[:, 2]), rtol=1e-12)

    batch = jnp.asarray(np.stack([_traj(seed=s) for s in range(4)]))
    bres = metrics.analyze_batch(batch, jnp.asarray(obs))
    assert bres["velocity"].mean.shape == (4,)

    rows = [metrics.summary_row(f"run{i}", metrics.analyze_run(batch[i], jnp.asarray(obs)))
            for i in range(4)]
    csv = tmp_path / "out.csv"
    metrics.export_csv(rows, str(csv))
    lines = csv.read_text().strip().split("\n")
    assert len(lines) == 5
    assert lines[0].startswith("run,")


def test_paired_sign_test_exact():
    """sweep.paired_sign_test: exact binomial two-sided p on discordant
    worlds (shared noise draws make algorithm columns paired — the
    docs/BASELINES.md n=50 significance machinery)."""
    from cilqr_tpu.sim.sweep import paired_sign_test

    # 0 vs 19 discordant: p = 2 * C(19,0)/2^19
    a = {"collided_mask": "0" * 19 + "1" * 10 + "0" * 21}
    b = {"collided_mask": "1" * 19 + "1" * 10 + "0" * 21}
    r = paired_sign_test(a, b)
    assert (r["only_a"], r["only_b"], r["both"]) == (0, 19, 10)
    np.testing.assert_allclose(r["p_value"], 2.0 / 2**19)

    # symmetric case: swapping rows swaps counts, same p
    r2 = paired_sign_test(b, a)
    assert (r2["only_a"], r2["only_b"]) == (19, 0)
    np.testing.assert_allclose(r2["p_value"], r["p_value"])

    # 5 vs 19 discordant reproduces the BASELINES ratio-0.2 sigma-0.5 cell
    a = {"collided_mask": "1" * 5 + "0" * 19 + "0" * 26}
    b = {"collided_mask": "0" * 5 + "1" * 19 + "0" * 26}
    r = paired_sign_test(a, b)
    assert r["n_discordant"] == 24
    np.testing.assert_allclose(r["p_value"], 0.006611, atol=1e-5)

    # no discordance -> p = 1
    same = {"collided_mask": "1100"}
    assert paired_sign_test(same, same)["p_value"] == 1.0
