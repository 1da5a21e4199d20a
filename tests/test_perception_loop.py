"""KF perception pipeline in the closed loop: camera sim -> tracker ->
semantic_lidar_map -> costmap -> planner (local_costmap.cpp:328-394 wired
into the full stack)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import tracker
from cilqr_tpu.ops import costmap as costmap_mod, gridmap
from cilqr_tpu.sim import perception, plant
from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams
import pytest


def _setup():
    p = dataclasses.replace(SolverParams(), horizon=10, max_iterations=3)
    # short corridor so the grid surrounds the ego (center ~0) and a nearby
    # obstacle is both camera-visible and inside the planning horizon
    cp = dataclasses.replace(
        CostmapParams(), rows=64, cols=48, window_radius=5, look_ahead_waypoints=10
    )
    noise = NoiseParams(0.02, 0.02, 0.002)
    gm = np.zeros((128, 128), np.float32)
    ggeom = gridmap.make_geom([130.0, -280.0], 1.0, 128, 128, dtype=jnp.float64)
    return p, cp, noise, gm, ggeom


def test_bbox_measurement_roundtrip():
    """A noiseless measurement rasterizes back onto the obstacle's cells."""
    cp = dataclasses.replace(CostmapParams(), rows=64, cols=48)
    geom = gridmap.make_geom([0.0, 0.0], cp.resolution, cp.rows, cp.cols,
                             dtype=jnp.float64)
    ego_xy = jnp.asarray([10.0, 5.0], jnp.float64)
    ego_yaw = jnp.asarray(0.3, jnp.float64)
    obs_xy = jnp.asarray([13.0, 6.0], jnp.float64)
    obs_size = jnp.asarray([3.0, 1.6], jnp.float64)
    obs_yaw = jnp.asarray(0.5, jnp.float64)

    z, valid = perception.bbox_measurement(cp, geom, ego_xy, ego_yaw,
                                           obs_xy, obs_size, obs_yaw)
    assert bool(valid)
    painted = costmap_mod.rasterize_tracked_bbox(geom, cp.rows, cp.cols, z, valid)

    # oracle: cells whose centers fall inside the obstacle's axis-aligned
    # bbox in the vehicle frame
    co, so = np.cos(0.5), np.sin(0.5)
    corners = np.array([[1.5, 0.8], [1.5, -0.8], [-1.5, -0.8], [-1.5, 0.8]])
    gxy = corners @ np.array([[co, so], [-so, co]]) + np.array([13.0, 6.0])
    ce, se = np.cos(0.3), np.sin(0.3)
    d = gxy - np.array([10.0, 5.0])
    local = np.stack([ce * d[:, 0] + se * d[:, 1],
                      -se * d[:, 0] + ce * d[:, 1]], axis=1)
    ci = np.asarray(gridmap.continuous_index(geom, jnp.asarray(local)))
    r0, r1 = ci[:, 0].min(), ci[:, 0].max()
    c0, c1 = ci[:, 1].min(), ci[:, 1].max()
    # SubmapIterator paints [int(r0), int(r0) + int(h)) x [int(c0), +int(w)):
    # the int casts (local_costmap.cpp:359-362) truncate up to frac(start)+frac(size)+1
    # ~3 cells at the far (exclusive) edge
    rows_painted = np.where(np.asarray(painted).sum(axis=1) > 0)[0]
    cols_painted = np.where(np.asarray(painted).sum(axis=0) > 0)[0]
    assert abs(rows_painted.min() - r0) <= 1.0 and abs(rows_painted.max() - r1) <= 3.0
    assert abs(cols_painted.min() - c0) <= 1.0 and abs(cols_painted.max() - c1) <= 3.0


def test_measurement_gate_out_of_plane():
    cp = dataclasses.replace(CostmapParams(), rows=64, cols=48)
    geom = gridmap.make_geom([0.0, 0.0], cp.resolution, cp.rows, cp.cols,
                             dtype=jnp.float64)
    # obstacle far outside the grid -> invalid, nothing painted
    z, valid = perception.bbox_measurement(
        cp, geom, jnp.asarray([0.0, 0.0]), jnp.asarray(0.0),
        jnp.asarray([500.0, 0.0]), jnp.asarray([3.0, 1.6]), jnp.asarray(0.0))
    assert not bool(valid)
    painted = costmap_mod.rasterize_tracked_bbox(geom, cp.rows, cp.cols, z, valid)
    assert float(jnp.max(painted)) == 0.0


def test_tracker_smooths_camera_stream():
    """The KF posterior tracks the moving true box through detector noise."""
    cp = dataclasses.replace(CostmapParams(), rows=64, cols=48)
    geom = gridmap.make_geom([0.0, 0.0], cp.resolution, cp.rows, cp.cols,
                             dtype=jnp.float64)
    T = 40
    rng = np.random.default_rng(7)
    zs, trues = [], []
    for t in range(T):
        obs_xy = jnp.asarray([3.0 + 0.02 * t, 1.0], jnp.float64)
        z, valid = perception.bbox_measurement(
            cp, geom, jnp.asarray([0.0, 0.0]), jnp.asarray(0.0),
            obs_xy, jnp.asarray([3.0, 1.6]), jnp.asarray(0.0))
        assert bool(valid)
        trues.append(np.asarray(z))
        zs.append(np.asarray(z) + rng.normal(0, 0.8, 4))
    boxes = np.asarray(tracker.track(jnp.asarray(zs), jnp.ones(T, bool),
                                     dtype=jnp.float64))
    trues = np.asarray(trues)
    # after burn-in the tracked box is closer to truth than the raw stream
    err_kf = np.abs(boxes[10:] - trues[10:]).mean()
    err_raw = np.abs(np.asarray(zs)[10:] - trues[10:]).mean()
    assert err_kf < err_raw
    assert err_kf < 1.0  # within a cell on average


@pytest.mark.slow
def test_closed_loop_tracked_box_shapes_costmap(global_plan):
    """Full stack with the camera channel: the *tracked* box reaches the
    planner-consumed uncertainty map and changes the plan (VERDICT item 3)."""
    p, cp, noise, gm, ggeom = _setup()
    from cilqr_tpu.models import reference_path as rp

    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    x0 = jnp.asarray([100.0, -305.6, 4.0, 0.05])
    # one obstacle 3 m ahead in-lane, creeping forward; camera-only channel
    obs_xyyaw = jnp.asarray([[103.0, -305.5, 0.05]], jnp.float64)
    obs_size = jnp.asarray([[4.5, 2.0]], jnp.float64)
    obs_mask = jnp.ones((1,), jnp.float64)
    percept = perception.PerceptionSim(
        0, jnp.asarray([0.5, 0.0], jnp.float64), bbox_sigma=0.5)

    n_cycles = 10
    gm64 = jnp.asarray(gm, jnp.float64)
    run = jax.jit(lambda pc: plant.closed_loop_full_stack(
        p, cp, noise, gm64, ggeom, plan, n, x0, jax.random.key(11), n_cycles,
        obstacles=None, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
        obs_mask=obs_mask, percept=pc,
    ), static_argnames=())
    xf_on, rec_on = plant.closed_loop_full_stack(
        p, cp, noise, gm64, ggeom, plan, n, x0, jax.random.key(11), n_cycles,
        obstacles=None, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
        obs_mask=obs_mask, percept=percept)
    # blind run: same world, but no sensor channel sees the obstacle at all
    xf_off, rec_off = plant.closed_loop_full_stack(
        p, cp, noise, gm64, ggeom, plan, n, x0, jax.random.key(11), n_cycles,
        obstacles=None, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
        obs_mask=jnp.zeros((1,), jnp.float64), percept=None)

    # the record carries the perception channel
    assert rec_on["tracked_box"].shape == (n_cycles, 4)
    assert bool(np.asarray(rec_on["bbox_valid"]).all())
    # the tracked box is painted into semantic_lidar_map every cycle
    assert (np.asarray(rec_on["semantic_max"]) == 100.0).all()
    # and flows into the propagated map the planner samples
    assert (np.asarray(rec_on["uncertainty_max"][2:])
            > np.asarray(rec_off["uncertainty_max"][2:])).all()
    # The planner reacts.  With the camera key now DERIVED from the cycle
    # key (plant.closed_loop_full_stack), the noise draws are bit-identical
    # between the two runs, so every difference below is pure perception
    # (the old assertion "ends slower" conflated perception with different
    # noise draws and only held by luck).  The physical signature of the
    # in-lane smear is two-phase: the ego eases off WHILE APPROACHING the
    # box (cycles 2..7, before closest approach), then accelerates OUT of
    # the smear once alongside (the barrier gradient points forward) — so
    # the final speed is *higher*, not lower.
    assert not np.allclose(np.asarray(xf_on), np.asarray(xf_off), atol=1e-3)
    v_on = np.asarray(rec_on["start_pos"])[:, 2]
    v_off = np.asarray(rec_off["start_pos"])[:, 2]
    assert (v_on[2:8] < v_off[2:8]).all(), (v_on, v_off)   # approach braking
    assert float(xf_on[2]) > float(xf_off[2]) + 0.05        # escape acceleration

    # the painted box is the KF estimate, not the raw measurement: after
    # burn-in they differ but stay within a couple of cells
    tb = np.asarray(rec_on["tracked_box"][3:])
    zm = np.asarray(rec_on["bbox_meas"][3:])
    assert not np.allclose(tb, zm, atol=1e-6)
    assert np.abs(tb - zm).mean() < 2.5


def test_closed_loop_invalid_camera_coasts(global_plan):
    """Out-of-plane readings: layer stays empty, track coasts, loop intact."""
    p, cp, noise, gm, ggeom = _setup()
    from cilqr_tpu.models import reference_path as rp

    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    x0 = jnp.asarray([100.0, -305.6, 4.0, 0.05])
    # obstacle far off the grid -> every measurement gated invalid
    obs_xyyaw = jnp.asarray([[400.0, -100.0, 0.0]], jnp.float64)
    obs_size = jnp.asarray([[4.5, 2.0]], jnp.float64)
    obs_mask = jnp.ones((1,), jnp.float64)
    percept = perception.PerceptionSim(
        0, jnp.asarray([0.0, 0.0], jnp.float64), bbox_sigma=0.5)

    xf, rec = plant.closed_loop_full_stack(
        p, cp, noise, jnp.asarray(gm, jnp.float64), ggeom, plan, n, x0,
        jax.random.key(2), 6, obstacles=None, obs_xyyaw=obs_xyyaw,
        obs_size=obs_size, obs_mask=obs_mask, percept=percept)
    assert not bool(np.asarray(rec["bbox_valid"]).any())
    assert (np.asarray(rec["semantic_max"]) == 0.0).all()
    assert (np.asarray(rec["tracked_box"]) == 0.0).all()
    assert np.isfinite(np.asarray(xf)).all()


@pytest.mark.slow
def test_batched_percept_matches_vmapped_single(global_plan):
    """closed_loop_full_stack_batched(percept=...) == vmap of the
    per-scenario perception loop (zero noise, noiseless camera)."""
    p, cp, _, gm, ggeom = _setup()
    import dataclasses as _dc
    p = _dc.replace(p, horizon=8, max_iterations=3)
    noise = NoiseParams(0.0, 0.0, 0.0)
    from cilqr_tpu.models import reference_path as rp

    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    obs_xyyaw = jnp.asarray([[103.0, -305.5, 0.05]], jnp.float64)
    obs_size = jnp.asarray([[4.5, 2.0]], jnp.float64)
    obs_mask = jnp.ones((1,), jnp.float64)
    percept = perception.PerceptionSim(
        0, jnp.asarray([0.5, 0.0], jnp.float64), bbox_sigma=0.0)

    B, n_cycles = 3, 3
    rng = np.random.default_rng(4)
    x0s = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.2, (B, 4)))
    gm64 = jnp.asarray(gm, jnp.float64)

    xf_b, rec_b = plant.closed_loop_full_stack_batched(
        p, cp, noise, gm64, ggeom, plan, n, x0s, jax.random.key(6), n_cycles,
        obstacles=None, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
        obs_mask=obs_mask, percept=percept)
    xf_s, rec_s = jax.vmap(
        lambda x0, k: plant.closed_loop_full_stack(
            p, cp, noise, gm64, ggeom, plan, n, x0, k, n_cycles,
            obstacles=None, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
            obs_mask=obs_mask, percept=percept)
    )(x0s, jax.random.split(jax.random.key(6), B))

    # batched records are (T, B, ...), single-path (B, T, ...)
    np.testing.assert_allclose(np.asarray(xf_b), np.asarray(xf_s),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(rec_b["tracked_box"]),
        np.moveaxis(np.asarray(rec_s["tracked_box"]), 0, 1),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(rec_b["bbox_valid"]),
        np.asarray(rec_s["bbox_valid"]).T)
    np.testing.assert_array_equal(
        np.asarray(rec_b["semantic_max"]),
        np.asarray(rec_s["semantic_max"]).T)
    assert (np.asarray(rec_b["semantic_max"]) == 100.0).all()


@pytest.mark.slow
def test_local_costmap_carries_layers(global_plan):
    """build_local_costmap populates semantic_lidar_map and ellipse_map."""
    p, cp, noise, gm, ggeom = _setup()
    from cilqr_tpu.models import reference_path as rp

    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    ego = jnp.asarray([100.0, -305.6, 4.0, 0.05], jnp.float64)
    box = jnp.asarray([-20.0, 120.0, 10.0, 8.0], jnp.float64)
    cm = costmap_mod.build_local_costmap(
        cp, jnp.asarray(gm, jnp.float64), ggeom, plan, n, ego,
        jnp.full((1, 2), 1e6), jnp.ones((1, 2)), jnp.zeros(1), jnp.zeros(1),
        tracked_box=box, tracked_valid=jnp.asarray(True),
        with_ellipse_layer=True,
    )
    sem = np.asarray(cm.semantic_lidar_map)
    assert sem.max() == 100.0 and (sem > 0).sum() == 10 * 8
    # semantic overrides the vehicle map before propagation
    assert np.asarray(cm.vehicle_map)[sem > 90].min() == 100.0
    ell = np.asarray(cm.ellipse_map)
    assert ell.max() == 100.0 and np.isfinite(ell).all()
