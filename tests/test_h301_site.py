"""h301-class real-site map: non-axis-aligned corridors through the full
stack (the geometry class of map_engine/maps/h301.yaml that the rectangular
synthetic town never exercises — VERDICT item 7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.ops import gridmap
from cilqr_tpu.sim import plant
from cilqr_tpu.utils import maps
from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams


def test_site_map_generation(tmp_path):
    yaml, center = maps.make_synthetic_site(str(tmp_path), size_m=60.0,
                                            resolution=0.5)
    occ, info = maps.load_map(yaml)
    assert occ.shape == (120, 120)
    arr, c = maps.to_gridmap_array(occ, info, unknown_value=100.0)
    geom = gridmap.make_geom(c, info.resolution, arr.shape[0], arr.shape[1],
                             dtype=jnp.float64)
    arr = jnp.asarray(arr)
    # every centerline point is free; points 1.2 corridor-half-widths to the
    # side (rotated normal!) are occupied
    a25 = np.deg2rad(25.0)
    nvec = np.array([-np.sin(a25), np.cos(a25)])
    for pt in center[2:20:4]:
        v = gridmap.sample_nearest(arr, geom, jnp.asarray(pt))
        assert float(v) == 0.0, pt
        v_off = gridmap.sample_nearest(arr, geom, jnp.asarray(pt + 4.2 * nvec))
        assert float(v_off) == 100.0, pt
    # the corridor is genuinely rotated: its free rows/cols are not constant
    free_rows, free_cols = np.where(np.asarray(arr) == 0.0)
    assert free_rows.std() > 5 and free_cols.std() > 5


def test_full_stack_on_rotated_site(tmp_path):
    """Closed loop along the 25-degree corridor: rotated prior gather,
    rotated-frame propagation, polyfit on a diagonal plan."""
    p = dataclasses.replace(SolverParams(), horizon=10, max_iterations=4,
                            desired_speed=4.0)
    cp = dataclasses.replace(CostmapParams(), rows=48, cols=48,
                             window_radius=5, look_ahead_waypoints=15)
    noise = NoiseParams(0.03, 0.03, 0.003)

    yaml, center = maps.make_synthetic_site(str(tmp_path), size_m=120.0,
                                            resolution=0.4)
    occ, info = maps.load_map(yaml)
    arr, c = maps.to_gridmap_array(occ, info, unknown_value=100.0)
    ggeom = gridmap.make_geom(c, info.resolution, arr.shape[0], arr.shape[1],
                              dtype=jnp.float64)
    gm = jnp.asarray(arr, jnp.float64)

    from cilqr_tpu.models import reference_path as rp
    plan, n = rp.pad_global_plan(p, center, dtype=jnp.float64)
    a25 = np.deg2rad(25.0)
    x0 = jnp.asarray([center[3, 0], center[3, 1], 3.5, a25])

    n_cycles = 12
    xf, rec = jax.jit(lambda x, k: plant.closed_loop_full_stack(
        p, cp, noise, gm, ggeom, plan, n, x, k, n_cycles))(
        x0, jax.random.key(9))

    assert np.isfinite(np.asarray(xf)).all()
    # progressed along the rotated corridor direction
    d = np.asarray(xf[:2] - x0[:2])
    fwd = float(d @ np.array([np.cos(a25), np.sin(a25)]))
    assert fwd > 2.0
    # stayed inside the corridor (lateral deviation from the centerline)
    lat = abs(float(d @ np.array([-np.sin(a25), np.sin(np.pi / 2 - a25)])))
    assert lat < 3.0
    # heading locked to the rotated lane
    assert abs(float(xf[3]) - a25) < 0.3
    # the rotated walls are inside the local map: propagation sees occupancy
    umax = np.asarray(rec["uncertainty_max"])
    assert (umax > 0.0).all() and (umax <= 100.0).all()
