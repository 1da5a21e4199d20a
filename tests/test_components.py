"""Tracker, map IO, occupancy conversions, DBSCAN."""

import numpy as np
import jax
import jax.numpy as jnp

from cilqr_tpu.models import tracker
from cilqr_tpu.ops import convert, dbscan, gridmap
from cilqr_tpu.utils import maps


# ------------------------------------------------------------------ tracker
def test_tracker_converges_to_constant_velocity():
    rng = np.random.default_rng(29)
    T = 60
    t = np.arange(T, dtype=np.float64)
    truth = np.stack([10 + 0.5 * t, 5 + 0.2 * t, np.full(T, 8.0), np.full(T, 4.0)], axis=1)
    zs = truth + rng.normal(0, 0.3, truth.shape)
    boxes = np.asarray(tracker.track(jnp.asarray(zs), jnp.ones(T, bool), dtype=jnp.float64))
    # after burn-in the filtered track is closer to truth than raw noise
    err_f = np.abs(boxes[20:] - truth[20:]).mean()
    err_z = np.abs(zs[20:] - truth[20:]).mean()
    assert err_f < err_z


def test_tracker_coasts_on_invalid():
    """Invalid measurement: state untouched, box cleared — matching the
    reference's reset-the-layer-not-the-filter gate
    (local_costmap.cpp:331-336)."""
    s = tracker.init(dtype=jnp.float64, x0=jnp.asarray([1.0, 2, 3, 4, 9, 9]))
    z = jnp.asarray([50.0, 60.0, 3.0, 4.0])
    s2, box = tracker.step(s, z, jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(box), 0.0)            # cleared layer
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s.x))  # coast
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s.P))


def test_tracker_matches_textbook_kf():
    """One predict+correct step equals the hand-computed KF update."""
    x0 = np.array([1.0, 2, 3, 4, 0.5, -0.5])
    s = tracker.init(dtype=jnp.float64, x0=x0)
    z = np.array([1.6, 1.4, 3.1, 4.2])
    s2, _ = tracker.step(s, jnp.asarray(z), jnp.asarray(True))

    F = np.eye(6); F[0, 4] = 1; F[1, 5] = 1
    H = np.zeros((4, 6)); H[:4, :4] = np.eye(4)
    Q = 1e-5 * np.eye(6); R = 1e-1 * np.eye(4)
    xp = F @ x0
    Pp = F @ np.eye(6) @ F.T + Q
    S = H @ Pp @ H.T + R
    K = Pp @ H.T @ np.linalg.inv(S)
    want_x = xp + K @ (z - H @ xp)
    np.testing.assert_allclose(np.asarray(s2.x), want_x, atol=1e-10)


# ------------------------------------------------------------------- map IO
def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(31)
    img = rng.integers(0, 255, (37, 53), dtype=np.uint8)
    p = tmp_path / "m.png"
    maps.write_png(str(p), img)
    back = maps.read_png(str(p))
    np.testing.assert_array_equal(back, img)


def test_map_yaml_load(tmp_path):
    img = np.full((20, 30), 254, np.uint8)
    img[5:8, 10:20] = 0  # occupied block
    maps.write_png(str(tmp_path / "town.png"), img)
    (tmp_path / "town.yaml").write_text(
        "image: town.png\nresolution: 0.2\norigin: [-3.0, -2.0, 0.0]\n"
        "negate: 0\noccupied_thresh: 0.65\nfree_thresh: 0.196\n"
    )
    occ, info = maps.load_map(str(tmp_path / "town.yaml"))
    assert info.resolution == 0.2
    assert occ.shape == (20, 30)
    assert (occ[5:8, 10:20] == 100).all()
    assert (occ[0, :] == 0).all()

    arr, center = maps.to_gridmap_array(occ, info)
    assert arr.shape == (30, 20)
    np.testing.assert_allclose(center, (-3.0 + 3.0, -2.0 + 2.0))
    # the occupied block must round-trip through gridmap sampling:
    geom = gridmap.make_geom(center, info.resolution, 30, 20, dtype=jnp.float64)
    # image row 5..7 (from top) -> y = origin + (H-1-r + .5)*res; col 10..19 -> x
    x = -3.0 + (10 + 0.5) * 0.2
    y = -2.0 + (20 - 1 - 5 + 0.5) * 0.2
    v = gridmap.sample_nearest(jnp.asarray(arr), geom, jnp.asarray([x, y]))
    assert float(v) == 100.0


def test_threshold_matches_convert_py():
    g = np.array([[0, 100, 149], [150, 200, 255]], np.uint8)
    out = maps.threshold_image(g)
    np.testing.assert_array_equal(out, [[0, 0, 0], [254, 254, 254]])


def _write_tga(path, gray, rle=False, top_down=False, bgr=False):
    """Minimal TGA writer for the decoder tests (grayscale or BGR)."""
    import struct as _st

    h, w = gray.shape
    bpp = 3 if bgr else 1
    img_type = (10 if bgr else 11) if rle else (2 if bgr else 3)
    desc = 0x20 if top_down else 0
    hdr = bytes([0, 0, img_type]) + b"\x00" * 9 + _st.pack(
        "<HH", w, h
    ) + bytes([8 * bpp, desc])
    rows = gray if top_down else gray[::-1]
    px = rows.reshape(-1)
    if bgr:
        px = np.repeat(px, 3)  # gray BGR: B=G=R
    body = b""
    if rle:
        # one raw packet per row (max 128 px per packet)
        flat = px.reshape(h, w * bpp)
        for r in range(h):
            row = flat[r]
            for c0 in range(0, w, 128):
                n = min(128, w - c0)
                body += bytes([n - 1]) + row[c0 * bpp : (c0 + n) * bpp].tobytes()
    else:
        body = px.tobytes()
    path.write_bytes(hdr + body)


def test_tga_decode_variants(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (19, 260), dtype=np.uint8)  # >128-px rows
    for rle in (False, True):
        for top_down in (False, True):
            p = tmp_path / f"t_{rle}_{top_down}.tga"
            _write_tga(p, img, rle=rle, top_down=top_down)
            np.testing.assert_array_equal(maps.read_tga(str(p)), img)
    # BGR path: gray replicated over channels must survive the 601 mix
    p = tmp_path / "t_bgr.tga"
    _write_tga(p, img, bgr=True)
    np.testing.assert_allclose(maps.read_tga(str(p)), img, atol=1)


def test_convert_tga_to_png_matches_reference_script(tmp_path):
    """convert.py:7-17: pixels ABOVE threshold 70 -> 0, others -> 255."""
    img = np.array([[0, 70, 71], [100, 200, 255]], np.uint8)
    tga = tmp_path / "m.tga"
    _write_tga(tga, img)
    maps.convert_tga_to_png(str(tga), str(tmp_path / "m.png"))
    out = maps.read_png(str(tmp_path / "m.png"))
    np.testing.assert_array_equal(out, [[255, 255, 0], [0, 0, 0]])


# -------------------------------------------------------------- conversions
def test_occupancy_grid_roundtrip():
    rng = np.random.default_rng(33)
    layer = jnp.asarray(rng.uniform(0, 100, (12, 8)), jnp.float32)
    layer = layer.at[3, 3].set(jnp.nan)
    geom = gridmap.make_geom([1.0, -2.0], 0.5, 12, 8, dtype=jnp.float32)
    msg = convert.to_occupancy_grid(layer, geom, 0.0, 100.0)
    assert msg.data.dtype == jnp.int8
    assert int(msg.data[3, 3]) == -1
    back, geom2 = convert.from_occupancy_grid(msg)
    assert np.isnan(np.asarray(back)[3, 3])
    good = ~np.isnan(np.asarray(back))
    np.testing.assert_allclose(
        np.asarray(back)[good], np.asarray(layer)[good], atol=0.51
    )
    np.testing.assert_allclose(np.asarray(geom2.center), [1.0, -2.0], atol=1e-6)


def test_gridmap_message_layers():
    a = jnp.zeros((4, 4)); b = jnp.ones((4, 4))
    geom = gridmap.make_geom([0.0, 0.0], 1.0, 4, 4)
    msg = convert.to_gridmap_message(
        {"vehicle_map": a, "uncertainty_map": b}, geom,
        jnp.asarray([1.0, 2.0]), jnp.asarray(0.3),
    )
    assert msg.layers == ("uncertainty_map", "vehicle_map")
    np.testing.assert_array_equal(np.asarray(convert.layer(msg, "vehicle_map")), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(convert.layer(msg, "uncertainty_map")), np.asarray(b))


# ------------------------------------------------------------------- dbscan
def test_dbscan_two_blobs_and_noise():
    rng = np.random.default_rng(35)
    blob1 = rng.normal([0, 0], 0.2, (20, 2))
    blob2 = rng.normal([5, 5], 0.2, (20, 2))
    noise = np.array([[10.0, -10.0], [-8.0, 9.0]])
    pts = jnp.asarray(np.concatenate([blob1, blob2, noise]))
    labels = np.asarray(dbscan.dbscan(pts, eps=1.0, min_points=4))
    l1 = set(labels[:20]); l2 = set(labels[20:40])
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2
    assert (labels[40:] == -1).all()


def test_dbscan_padding_masked():
    pts = jnp.asarray(np.concatenate([np.random.default_rng(0).normal(0, 0.1, (10, 2)),
                                      np.zeros((6, 2))]))
    mask = jnp.asarray([True] * 10 + [False] * 6)
    labels = np.asarray(dbscan.dbscan(pts, eps=0.5, mask=mask, min_points=3))
    assert (labels[10:] == -1).all()
    assert len(set(labels[:10])) == 1


def test_dbscan_chain_connectivity():
    """A chain of core points must merge into one cluster (label propagation
    over multiple hops)."""
    pts = jnp.asarray(np.stack([np.arange(30) * 0.4, np.zeros(30)], axis=1))
    labels = np.asarray(dbscan.dbscan(pts, eps=0.5, min_points=2))
    assert len(set(labels)) == 1 and labels[0] != -1
