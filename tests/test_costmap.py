"""Costmap engine tests: gridmap math, rasterization, uncertainty propagation."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.ops import costmap, gridmap
from cilqr_tpu.utils.params import CostmapParams
from oracle import oracle_costmap


def small_costmap_params(**kw):
    base = dict(rows=24, cols=16, window_radius=8)
    base.update(kw)
    return dataclasses.replace(CostmapParams(), **base)


# ------------------------------------------------------------------ gridmap
def test_position_index_roundtrip():
    geom = gridmap.make_geom([3.0, -1.0], 0.2, 30, 20, dtype=jnp.float64)
    idx = jnp.stack(
        jnp.meshgrid(jnp.arange(30), jnp.arange(20), indexing="ij"), axis=-1
    )
    pos = gridmap.position_from_index(geom, idx)
    back = gridmap.index_from_position(geom, pos)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_grid_orientation_matches_grid_map_convention():
    """Index (0,0) must sit at the (+x, +y) corner (GridMapMath semantics)."""
    geom = gridmap.make_geom([0.0, 0.0], 0.5, 4, 4, dtype=jnp.float64)
    p00 = gridmap.position_from_index(geom, jnp.array([0, 0]))
    p33 = gridmap.position_from_index(geom, jnp.array([3, 3]))
    assert p00[0] > p33[0] and p00[1] > p33[1]
    np.testing.assert_allclose(np.asarray(p00), [0.75, 0.75])


def test_polygon_rasterization_axis_aligned():
    geom = gridmap.make_geom([0.0, 0.0], 1.0, 8, 8, dtype=jnp.float64)
    verts = jnp.asarray([[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]])
    mask = np.asarray(gridmap.rasterize_polygon(geom, 8, 8, verts))
    xs, ys = gridmap.cell_positions(geom, 8, 8)
    xs, ys = np.asarray(xs), np.asarray(ys)
    want = ((np.abs(xs)[:, None] <= 2.0) & (np.abs(ys)[None, :] <= 2.0)).astype(float)
    np.testing.assert_array_equal(mask, want)


def test_ellipse_mask_matches_quadratic_form():
    geom = gridmap.make_geom([0.0, 0.0], 0.25, 32, 32, dtype=jnp.float64)
    m = gridmap.ellipse_mask(
        geom, 32, 32, jnp.asarray([0.5, -0.25]), jnp.asarray([2.0, 1.0]), jnp.asarray(0.7)
    )
    xs, ys = gridmap.cell_positions(geom, 32, 32)
    xs, ys = np.asarray(xs), np.asarray(ys)
    dx = xs[:, None] - 0.5
    dy = ys[None, :] + 0.25
    c, s = np.cos(0.7), np.sin(0.7)
    u = c * dx + s * dy
    w = s * dx - c * dy
    want = (u / 2.0) ** 2 + (w / 1.0) ** 2 <= 1.0
    np.testing.assert_array_equal(np.asarray(m), want)


def test_bilinear_grad_matches_fd():
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.uniform(0, 100, (20, 20)))
    geom = gridmap.make_geom([0.0, 0.0], 0.2, 20, 20, dtype=jnp.float64)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (50, 2)))
    val, grad = gridmap.sample_bilinear_with_grad(data, geom, pts)
    eps = 1e-6
    for k in range(2):
        e = np.zeros(2)
        e[k] = eps
        vp, _ = gridmap.sample_bilinear_with_grad(data, geom, pts + jnp.asarray(e))
        vm, _ = gridmap.sample_bilinear_with_grad(data, geom, pts - jnp.asarray(e))
        fd = (np.asarray(vp) - np.asarray(vm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grad[:, k]), fd, atol=1e-4)


# ------------------------------------------------------ uncertainty kernel
@pytest.mark.parametrize("yaw", [0.0, 0.9, 3.5])
@pytest.mark.parametrize("faithful", [False, True])
def test_propagation_matches_ellipse_iterator_oracle(yaw, faithful):
    """Fixed-window masked propagation == exact EllipseIterator semantics,
    in both the corrected-PSD and reference-faithful rho modes."""
    cp = small_costmap_params(sigma_x=0.08, sigma_y=0.06, sigma_theta=0.05)
    rng = np.random.default_rng(9)
    prior = rng.uniform(0, 100, (cp.rows, cp.cols))
    center = np.array([1.2, -0.4])

    need = costmap.required_window_radius(cp, cp.rows, cp.cols, center)
    assert need <= cp.window_radius, (need, cp.window_radius)

    geom = gridmap.make_geom(center, cp.resolution, cp.rows, cp.cols, dtype=jnp.float64)
    got = np.asarray(
        costmap.propagate_uncertainty_reference(
            cp, jnp.asarray(prior), geom, jnp.asarray(yaw), faithful_rho=faithful
        )
    )
    want = oracle_costmap.propagate(cp, prior, center, yaw, faithful_rho=faithful)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_propagation_tiny_sigma_is_identity_like():
    """With near-zero sigma the ellipse collapses to the center cell."""
    cp = small_costmap_params(sigma_x=1e-4, sigma_y=1e-4, sigma_theta=1e-6)
    rng = np.random.default_rng(10)
    prior = rng.uniform(0, 100, (cp.rows, cp.cols))
    geom = gridmap.make_geom([0.0, 0.0], cp.resolution, cp.rows, cp.cols, dtype=jnp.float64)
    got = np.asarray(
        costmap.propagate_uncertainty_reference(cp, jnp.asarray(prior), geom, jnp.asarray(0.3))
    )
    np.testing.assert_allclose(got, prior, atol=1e-6)


# --------------------------------------------------------------- full tick
@pytest.mark.slow
def test_build_local_costmap_pipeline(global_plan):
    # taller grid: the corridor-derived center sits ~2.6 m left of the lane
    # (8 m left / 4 m right corridor), so the map must span back to y~0
    cp = small_costmap_params(cols=48)
    rng = np.random.default_rng(13)
    gmap = jnp.asarray(rng.uniform(0, 100, (64, 64)))
    ggeom = gridmap.make_geom([100.0, -305.0], 2.0, 64, 64, dtype=jnp.float64)

    wpts = jnp.asarray(global_plan)
    ego = jnp.asarray([100.0, -305.6, 4.0, 0.05])
    # first obstacle ~15 m ahead of the ego — inside the corridor-centered
    # small test map (center x = x_len/2 - 5 ~ 15 m); second beyond the gate
    obs_xy = jnp.asarray([[115.0, -305.0], [500.0, 500.0]])
    obs_size = jnp.asarray([[3.63, 1.84], [3.63, 1.84]])
    obs_yaw = jnp.asarray([0.1, 0.0])
    obs_mask = jnp.asarray([1.0, 1.0])

    out = costmap.build_local_costmap(
        cp, gmap, ggeom, wpts, jnp.asarray(wpts.shape[0]), ego,
        obs_xy, obs_size, obs_yaw, obs_mask,
    )
    assert out.uncertainty_map.shape == (cp.rows, cp.cols)
    # obstacle 1 is in range -> some cells rasterized at 100; obstacle 2 is
    # beyond the 100 m gate -> contributes nothing
    assert float(jnp.max(out.bounding_box_map)) == 100.0
    assert np.isfinite(np.asarray(out.uncertainty_map)).all()
    # bbox cells override the prior in vehicle_map (local_costmap.cpp:260-263)
    bb = np.asarray(out.bounding_box_map) > 90
    np.testing.assert_allclose(np.asarray(out.vehicle_map)[bb], 100.0)
    # corridor mask is a valid 0/1 layer; the small test grid sits entirely
    # inside the ~40x12 m corridor bbox so full coverage is expected here
    cm = np.asarray(out.corridor_mask)
    assert 0 < cm.sum() <= cm.size and set(np.unique(cm)) <= {0.0, 1.0}


def test_corridor_geometry_moves_with_ego(global_plan):
    cp = small_costmap_params()
    wpts = jnp.asarray(global_plan)
    n = jnp.asarray(wpts.shape[0])
    c1, (xl1, yl1), bounds = costmap.corridor_geometry(
        cp, wpts, n, jnp.asarray([100.0, -305.6]), jnp.asarray(0.05)
    )
    c2, _, _ = costmap.corridor_geometry(
        cp, wpts, n, jnp.asarray([130.0, -304.0]), jnp.asarray(0.0)
    )
    assert float(bounds[1]) > float(bounds[0]) and float(bounds[3]) > float(bounds[2])
    assert np.isfinite(np.asarray(c1)).all() and np.isfinite(np.asarray(c2)).all()
    # corridor spans ~40 waypoints ahead plus 12 m laterally
    assert float(xl1) > 10.0 and float(yl1) >= 12.0


@pytest.mark.slow
def test_corridor_center_bounds_cover_route(global_plan):
    """The concrete center intervals cover every corridor geometry produced
    by egos scattered around the route (the full-stack batched scatter)."""
    import jax

    cp = small_costmap_params()
    wpts = jnp.asarray(global_plan)
    n = jnp.asarray(wpts.shape[0])
    (x_lo, x_hi), (y_lo, y_hi) = costmap.corridor_center_bounds(
        cp, wpts, wpts.shape[0]
    )
    assert x_lo < x_hi and y_lo < y_hi

    # the benchmark's actual scatter: N(0, 0.3) on x/y/yaw — include the
    # 4-sigma yaw tails explicitly (the corridor center ROTATES with yaw,
    # so tail yaws move it by ~half the 40 m look-ahead)
    rng = np.random.default_rng(7)
    S = 64
    idx = rng.integers(0, wpts.shape[0] - 1, S)
    base = np.asarray(global_plan)[idx]
    tang = np.asarray(global_plan)[np.minimum(idx + 1, wpts.shape[0] - 1)] - base
    yaw = np.arctan2(tang[:, 1], tang[:, 0])
    egos_xy = base + rng.normal(0, 0.3, (S, 2))
    dyaw = rng.normal(0, 0.3, S)
    dyaw[:8] = np.linspace(-1.2, 1.2, 8)  # force the 4-sigma tails
    yaws = yaw + dyaw
    centers = jax.vmap(
        lambda e, y: costmap.corridor_geometry(cp, wpts, n, e, y)[0]
    )(jnp.asarray(egos_xy), jnp.asarray(yaws))
    c = np.asarray(centers)
    assert (c[:, 0] >= x_lo).all() and (c[:, 0] <= x_hi).all()
    assert (c[:, 1] >= y_lo).all() and (c[:, 1] <= y_hi).all()


@pytest.mark.parametrize("fused", [True, False])
def test_sample_prior_pallas_matches_xla(global_plan, fused):
    """Window-gather Pallas sampler (sample_pallas) vs vmapped sample_prior:
    bit-identical f32 nearest resample across frames and yaw quadrants,
    for both the fused grid=(B,) and the per-tile grid=(B, T) forms."""
    import jax

    from cilqr_tpu.ops import sample_pallas

    rows, cols, res_v, res_g = 48, 40, 0.2, 0.5
    H, W = 96, 88
    rng = np.random.default_rng(4)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), jnp.float32)
    ggeom = gridmap.make_geom([110.0, -300.0], res_g, H, W, dtype=jnp.float32)
    B = 6
    egos = jnp.asarray(
        np.stack([rng.uniform(100, 120, B), rng.uniform(-310, -290, B)], -1),
        jnp.float32,
    )
    yaws = jnp.asarray(rng.uniform(-3.2, 3.2, B), jnp.float32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 10, B), rng.uniform(-3, 3, B)], -1),
        jnp.float32,
    )
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=jnp.float32)
    )(centers)

    assert sample_pallas.supports(rows, cols, res_v, res_g, H, W)
    got = sample_pallas.sample_prior_batched_tpu(
        geoms, rows, cols, res_v, res_g, gmap, ggeom, egos, yaws, fused=fused
    )
    want = jax.vmap(
        lambda g, e, y: costmap.sample_prior(g, rows, cols, gmap, ggeom, e, y)
    )(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _shear_pose_grid(map_center, span, yaw_list, pose_list):
    ex, ey, yw = [], [], []
    for x, y in pose_list:
        for y_ in yaw_list:
            ex.append(x)
            ey.append(y)
            yw.append(y_)
    return np.asarray(ex), np.asarray(ey), np.asarray(yw)


def test_sample_prior_shear_matches_xla(global_plan):
    """Shear-decomposition Pallas sampler vs vmapped sample_prior:
    bit-identical across yaw quadrants (incl. the eps-critical cos<0 /
    sin<0 angles), border-touching and off-map poses (which exercise the
    in-kernel window fallback)."""
    import jax

    from cilqr_tpu.ops import sample_pallas

    rows, cols, res_v, res_g = 64, 56, 0.2, 0.5
    H, W = 136, 132
    rng = np.random.default_rng(7)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), jnp.float32)
    ggeom = gridmap.make_geom([50.0, -80.0], res_g, H, W, dtype=jnp.float32)
    assert sample_pallas.supports_shear(rows, cols, res_v, res_g, H, W)

    # centered, near-border, partially off, fully off poses x yaws that
    # cover mode A/B and both eps signs (pi, -pi/2, -3.0 regressed once)
    ex, ey, yw = _shear_pose_grid(
        (50.0, -80.0), 30.0,
        [0.0, np.pi / 4, np.pi / 2, np.pi, -np.pi / 2, -3.0, 2.2, -0.3],
        [(50.0, -80.0), (62.0, -74.0), (78.0, -80.0), (50.0, -104.0),
         (120.0, -80.0), (50.0, -200.0)],
    )
    B = len(ex)
    egos = jnp.asarray(np.stack([ex, ey], -1), jnp.float32)
    yaws = jnp.asarray(yw, jnp.float32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 10, B), rng.uniform(-3, 3, B)], -1),
        jnp.float32,
    )
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=jnp.float32)
    )(centers)

    got = sample_pallas.sample_prior_batched_tpu(
        geoms, rows, cols, res_v, res_g, gmap, ggeom, egos, yaws,
        algo="shear",
    )
    want = jax.vmap(
        lambda g, e, y: costmap.sample_prior(g, rows, cols, gmap, ggeom, e, y)
    )(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_prior_window_offset_coverage_regression(global_plan):
    """Regression: the window kernel's offset loop must cover
    o = lr - s up to extent + 14.  At cols=56 (extent 24, formerly
    WR=32 < 24+14) a yaw=-pi/2 pose with the right index alignment left
    ~1/3 of the first output row unwritten (zeros) — caught via the shear
    kernel's fallback path, fixed by the extent+14 window sizing."""
    import jax

    from cilqr_tpu.ops import sample_pallas

    rows, cols, res_v, res_g = 64, 56, 0.2, 0.5
    H, W = 136, 132
    rng = np.random.default_rng(7)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), jnp.float32)
    ggeom = gridmap.make_geom([50.0, -80.0], res_g, H, W, dtype=jnp.float32)
    egos = jnp.asarray([[50.0, -104.0]], jnp.float32)
    yaws = jnp.asarray([-np.pi / 2], jnp.float32)
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=jnp.float32)
    )(jnp.asarray([[9.0, 0.5]], jnp.float32))
    got = sample_pallas.sample_prior_batched_tpu(
        geoms, rows, cols, res_v, res_g, gmap, ggeom, egos, yaws,
        algo="window",
    )
    want = jax.vmap(
        lambda g, e, y: costmap.sample_prior(g, rows, cols, gmap, ggeom, e, y)
    )(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_sample_prior_shear_matches_xla_production_size(global_plan):
    """Shear sampler at the production 152x104 @ 0.2 m grid over a 256^2
    @ 0.5 m global map: bit-identical for random poses and yaws."""
    import jax

    from cilqr_tpu.ops import sample_pallas

    rows, cols, res_v, res_g = 152, 104, 0.2, 0.5
    H = W = 256
    rng = np.random.default_rng(11)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), jnp.float32)
    ggeom = gridmap.make_geom([110.0, -300.0], res_g, H, W, dtype=jnp.float32)
    assert sample_pallas.supports_shear(rows, cols, res_v, res_g, H, W)
    B = 24
    egos = jnp.asarray(
        np.stack([rng.uniform(80, 140, B), rng.uniform(-330, -270, B)], -1),
        jnp.float32,
    )
    yaws = jnp.asarray(rng.uniform(-np.pi, np.pi, B), jnp.float32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 10, B), rng.uniform(-3, 3, B)], -1),
        jnp.float32,
    )
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=jnp.float32)
    )(centers)
    got = sample_pallas.sample_prior_batched_tpu(
        geoms, rows, cols, res_v, res_g, gmap, ggeom, egos, yaws,
        algo="shear",
    )
    want = jax.vmap(
        lambda g, e, y: costmap.sample_prior(g, rows, cols, gmap, ggeom, e, y)
    )(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_build_local_costmap_batched_sample_kernel_path(global_plan):
    """build_local_costmap_batched(global_res=...) (Pallas prior resample)
    vs the default vmapped-XLA path: identical pipelines."""
    import dataclasses as _dc

    import jax

    cp = _dc.replace(CostmapParams(), rows=32, cols=24, window_radius=5)
    rng = np.random.default_rng(9)
    gm = jnp.asarray(rng.uniform(0, 100, (128, 128)), jnp.float32)
    ggeom = gridmap.make_geom([130.0, -280.0], 1.0, 128, 128, dtype=jnp.float32)
    wpts = jnp.asarray(global_plan, jnp.float32)
    n = jnp.asarray(wpts.shape[0])
    B = 3
    egos = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.3, (B, 4)),
        jnp.float32,
    )
    obs_xy = jnp.asarray([[115.0, -305.0]], jnp.float32)
    obs_size = jnp.asarray([[3.63, 1.84]], jnp.float32)
    obs_yaw = jnp.asarray([0.1], jnp.float32)
    obs_mask = jnp.asarray([1.0], jnp.float32)

    fast = costmap.build_local_costmap_batched(
        cp, gm, ggeom, wpts, n, egos, obs_xy, obs_size, obs_yaw, obs_mask,
        global_res=1.0,
    )
    ref = costmap.build_local_costmap_batched(
        cp, gm, ggeom, wpts, n, egos, obs_xy, obs_size, obs_yaw, obs_mask,
    )
    np.testing.assert_array_equal(
        np.asarray(fast.vehicle_map), np.asarray(ref.vehicle_map)
    )
    np.testing.assert_allclose(
        np.asarray(fast.uncertainty_map), np.asarray(ref.uncertainty_map),
        rtol=1e-6, atol=1e-4,
    )


def test_cell_sigma_rho_anisotropic_rotates_diag():
    """Advisor r3: anisotropic (sigma_x != sigma_y) translational
    covariance must rotate into the map frame.  Check the implied 2x2
    covariance against the direct R(-yaw) diag R(yaw) + lever form, and
    that the isotropic path is bit-identical to the historical formula."""
    cp = small_costmap_params()
    xs = jnp.linspace(-2.0, 3.0, 7)
    ys = jnp.linspace(-1.5, 1.5, 5)

    for yaw in (0.0, 0.7, -2.2, np.pi / 2):
        sx_c, sy_c, rho = costmap.cell_sigma_rho(
            cp, xs, ys, jnp.asarray(yaw), sigmas=(0.3, 0.1, 0.05))
        s, c = np.sin(yaw), np.cos(yaw)
        R = np.array([[c, -s], [s, c]])
        cov_g = np.diag([0.3**2, 0.1**2])
        cov_m_t = R.T @ cov_g @ R
        for i, Cx in enumerate(np.asarray(xs)):
            for j, Cy in enumerate(np.asarray(ys)):
                g_m = np.array([-Cy, Cx])
                cov_m = cov_m_t + 0.05**2 * np.outer(g_m, g_m)
                np.testing.assert_allclose(
                    float(sx_c[i, j]) ** 2, cov_m[0, 0], rtol=1e-5)
                np.testing.assert_allclose(
                    float(sy_c[i, j]) ** 2, cov_m[1, 1], rtol=1e-5)
                np.testing.assert_allclose(
                    float(rho[i, j]) * float(sx_c[i, j]) * float(sy_c[i, j]),
                    cov_m[0, 1], rtol=1e-5, atol=1e-9)

    # isotropic: bit-identical to the historical (unrotated) formula
    sx_c, sy_c, rho = costmap.cell_sigma_rho(
        cp, xs, ys, jnp.asarray(0.9), sigmas=(0.16, 0.16, 0.017))
    u = (-ys[None, :]) ** 2 + 0.0 * xs[:, None]
    v = (xs[:, None]) ** 2 + 0.0 * ys[None, :]
    t = (-ys[None, :] + 0.0 * xs[:, None]) * (xs[:, None] + 0.0 * ys[None, :])
    sx_ref = jnp.sqrt(0.16**2 + 0.017**2 * u)
    sy_ref = jnp.sqrt(0.16**2 + 0.017**2 * v)
    np.testing.assert_array_equal(np.asarray(sx_c), np.asarray(sx_ref))
    np.testing.assert_array_equal(np.asarray(sy_c), np.asarray(sy_ref))
    np.testing.assert_array_equal(
        np.asarray(rho), np.asarray(0.017**2 * t / (sx_ref * sy_ref)))


def test_shear_u_span_guard_and_auto_fallback():
    """Round-4 review regression: supports_shear must bound the SCENARIO'S
    u-axis span (the sheared scratch has 128 lanes) — wide-short grids at
    k=1 passed the m-axis check alone and silently gathered garbage for
    interior poses.  The guard must reject, and algo='auto' must then
    produce exact values via the window path."""
    import jax

    from cilqr_tpu.ops import sample_pallas

    rows, cols, res_v, res_g = 64, 126, 0.5, 0.5
    H, W = 256, 256
    assert not sample_pallas.supports_shear(rows, cols, res_v, res_g, H, W)
    assert sample_pallas.supports(rows, cols, res_v, res_g, H, W)

    rng = np.random.default_rng(11)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), jnp.float32)
    ggeom = gridmap.make_geom([0.0, 0.0], res_g, H, W, dtype=jnp.float32)
    # the poses that reproduced the corruption pre-guard (292 and 55 wrong
    # cells at yaw 1.45 / pi/4) plus quadrant coverage
    ex = np.asarray([5.0, 5.0, 0.0, -8.0])
    ey = np.asarray([3.0, 3.0, 0.0, 6.0])
    yw = np.asarray([1.45, np.pi / 4, -2.8, 0.3])
    B = len(ex)
    egos = jnp.asarray(np.stack([ex, ey], -1), jnp.float32)
    yaws = jnp.asarray(yw, jnp.float32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 4, B), rng.uniform(-2, 2, B)], -1),
        jnp.float32)
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=jnp.float32)
    )(centers)
    got = sample_pallas.sample_prior_batched_tpu(
        geoms, rows, cols, res_v, res_g, gmap, ggeom, egos, yaws,
        algo="auto")
    want = jax.vmap(
        lambda g, e, y: costmap.sample_prior(g, rows, cols, gmap, ggeom, e, y)
    )(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_window_kernel_bottom_clipped_row0_regression():
    """Round-4 review regression: with the row window clipped at the map
    bottom (pose at/over the low-x border -> ii near H-1), lr inflated past
    the offset loop's coverage and the kernel returned 0 instead of the
    border-clamped map values (840 wrong cells at the production-eligible
    64x56@0.2 / 136x132@0.5 config).  Exactness must hold on the window
    path AND through the shear kernel's border fallback."""
    import jax

    from cilqr_tpu.ops import sample_pallas

    rows, cols, res_v, res_g = 64, 56, 0.2, 0.5
    H, W = 136, 132
    rng = np.random.default_rng(13)
    gmap = jnp.asarray(rng.uniform(1.0, 100, (H, W)), jnp.float32)
    ggeom = gridmap.make_geom([50.0, -80.0], res_g, H, W, dtype=jnp.float32)
    # low-x border (ii ~ H-1, row0 clipped), several yaws; plus a corner
    ex = np.asarray([16.0, 16.0, 16.0, 17.5])
    ey = np.asarray([-80.0, -80.0, -100.0, -47.0])
    yw = np.asarray([0.0, 2.0, -np.pi / 2, np.pi])
    B = len(ex)
    egos = jnp.asarray(np.stack([ex, ey], -1), jnp.float32)
    yaws = jnp.asarray(yw, jnp.float32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 10, B), rng.uniform(-3, 3, B)], -1),
        jnp.float32)
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=jnp.float32)
    )(centers)
    want = jax.vmap(
        lambda g, e, y: costmap.sample_prior(g, rows, cols, gmap, ggeom, e, y)
    )(geoms, egos, yaws)
    for algo in ("window", "shear"):
        got = sample_pallas.sample_prior_batched_tpu(
            geoms, rows, cols, res_v, res_g, gmap, ggeom, egos, yaws,
            algo=algo)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
