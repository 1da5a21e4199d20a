"""Frame transforms, confidence ellipse, submap/tracked-bbox raster,
algorithm comparison tables."""

import numpy as np
import jax.numpy as jnp

from cilqr_tpu.ops import costmap, gridmap
from cilqr_tpu.utils import frames, metrics


def test_faithful_frames_are_reflective_involution():
    """The C++ pair composes to identity because each leg applies the same
    reflection (ilqr_uncertainty_node.cpp:286-313)."""
    rng = np.random.default_rng(71)
    path = jnp.asarray(rng.normal(0, 50, (20, 2)))
    ego = jnp.asarray([10.0, -5.0, 3.0, 0.7])
    v = frames.global_to_vehicle(path, ego)
    back = frames.vehicle_to_global(v, ego)
    np.testing.assert_allclose(np.asarray(back), np.asarray(path), atol=1e-9)
    # ...but a single leg differs from the proper rotation in y (reflection)
    vr = frames.global_to_vehicle_rot(path, ego)
    assert np.allclose(np.asarray(v[:, 0]), np.asarray(vr[:, 0]))
    assert not np.allclose(np.asarray(v[:, 1]), np.asarray(vr[:, 1]))
    np.testing.assert_allclose(np.asarray(v[:, 1]), -np.asarray(vr[:, 1]), atol=1e-9)


def test_rot_frames_roundtrip():
    rng = np.random.default_rng(72)
    path = jnp.asarray(rng.normal(0, 50, (20, 2)))
    ego = jnp.asarray([1.0, 2.0, 0.0, -1.2])
    back = frames.vehicle_to_global_rot(frames.global_to_vehicle_rot(path, ego), ego)
    np.testing.assert_allclose(np.asarray(back), np.asarray(path), atol=1e-9)


def test_confidence_ellipse_matches_numpy_eig():
    rng = np.random.default_rng(73)
    for _ in range(50):
        A = rng.normal(0, 1, (2, 2))
        cov = A @ A.T + 0.01 * np.eye(2)
        hM, hm, ang = gridmap.confidence_ellipse(jnp.asarray(cov))
        w, V = np.linalg.eigh(cov)
        np.testing.assert_allclose(float(hM), 2.4477 * np.sqrt(w[1]), rtol=1e-6)
        np.testing.assert_allclose(float(hm), 2.4477 * np.sqrt(w[0]), rtol=1e-6)
        vmaj = V[:, 1]
        want = np.arctan2(vmaj[1], vmaj[0]) % (2 * np.pi)
        got = float(ang) % np.pi  # eigenvector sign is arbitrary mod pi
        assert abs(got - want % np.pi) < 1e-5 or abs(got - want % np.pi - np.pi) < 1e-5


def test_submap_mask_and_tracked_bbox():
    m = np.asarray(gridmap.submap_mask(10, 8, jnp.asarray([2, 3]), jnp.asarray([4, 2])))
    assert m.sum() == 8
    assert m[2:6, 3:5].all() and m[:2].sum() == 0

    geom = gridmap.make_geom([15.0, 0.0], 0.2, 200, 120, dtype=jnp.float64)
    box = jnp.asarray([10.0, 60.0, 20.0, 30.0])  # cx, cy, w, h
    layer = np.asarray(costmap.rasterize_tracked_bbox(geom, 200, 120, box, jnp.asarray(True)))
    assert layer.max() == 100.0
    # start = (150 - 60 - 15, 50 + 10 - 10) = (75, 50), extent (30, 20)
    assert layer[75:105, 50:70].min() == 100.0
    assert layer.sum() == 100.0 * 30 * 20
    cleared = np.asarray(costmap.rasterize_tracked_bbox(geom, 200, 120, box, jnp.asarray(False)))
    assert cleared.sum() == 0.0


def test_compare_algorithms(tmp_path):
    rng = np.random.default_rng(74)
    def runs(seed):
        r = np.random.default_rng(seed)
        t = np.arange(30) * 0.1
        return np.stack([
            np.stack([100 + 4*t + r.normal(0, .1, 30), -306 + r.normal(0, .1, 30),
                      4 + r.normal(0, .1, 30), np.zeros(30)], axis=1)
            for _ in range(3)
        ])
    obs = jnp.asarray([[110.0, -306.0]])
    rows = metrics.compare_algorithms(
        {"CILQR": runs(1), "Frenet": runs(2)}, obs
    )
    names = [r["run"] for r in rows]
    assert "CILQR/mean" in names and "Frenet/0" in names
    assert len(rows) == 8  # 2 algos x (3 runs + 1 mean)
    metrics.export_csv(rows, str(tmp_path / "cmp.csv"))
    assert (tmp_path / "cmp.csv").exists()
