"""Full-stack closed loop: synthetic town map -> per-cycle costmap -> solve."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.ops import gridmap
from cilqr_tpu.sim import plant, runner, scenarios
from cilqr_tpu.utils import maps
from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams
import pytest


def test_synthetic_town_map(tmp_path):
    yaml = maps.make_synthetic_town(str(tmp_path), size_m=60.0, resolution=0.5,
                                    origin=(40.0, -330.0))
    occ, info = maps.load_map(yaml)
    assert occ.shape == (120, 120)
    assert set(np.unique(occ)) <= {0.0, 100.0}
    arr, center = maps.to_gridmap_array(occ, info, unknown_value=100.0)
    geom = gridmap.make_geom(center, info.resolution, arr.shape[0], arr.shape[1], dtype=jnp.float64)
    # the south-leg lane (y=-306.74) must be free, off-road occupied
    v_lane = gridmap.sample_nearest(jnp.asarray(arr), geom, jnp.asarray([60.0, -306.74]))
    v_off = gridmap.sample_nearest(jnp.asarray(arr), geom, jnp.asarray([60.0, -320.0]))
    assert float(v_lane) == 0.0 and float(v_off) == 100.0


def test_full_stack_closed_loop(global_plan):
    p = dataclasses.replace(SolverParams(), horizon=12, max_iterations=4)
    cp = dataclasses.replace(CostmapParams(), rows=32, cols=48, window_radius=6)
    noise = NoiseParams(0.05, 0.05, 0.005)

    # synthetic global map: free everywhere except an off-lane block
    gm = np.zeros((128, 128), np.float32)
    gm[20:40, 20:40] = 100.0
    ggeom = gridmap.make_geom([130.0, -280.0], 1.0, 128, 128, dtype=jnp.float64)

    from cilqr_tpu.models import reference_path as rp
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    sc = scenarios.Scenario("t", np.array([[120.0, -305.0, 0.0]]))
    ob, obs_xyyaw, obs_size, obs_mask = runner.build_scenario_inputs(p, sc, jnp.float64)

    x0 = jnp.asarray([100.0, -305.6, 4.0, 0.05])
    fn = jax.jit(
        lambda x, k: plant.closed_loop_full_stack(
            p, cp, noise, jnp.asarray(gm, jnp.float64), ggeom, plan, n, x, k, 8,
            obstacles=ob, obs_xyyaw=obs_xyyaw, obs_size=obs_size, obs_mask=obs_mask,
        ),
        static_argnames=(),
    )
    xf, rec = fn(x0, jax.random.key(5))
    assert np.isfinite(np.asarray(xf)).all()
    assert rec["start_pos"].shape == (8, 4)
    assert float(xf[0]) > float(x0[0])          # progress
    assert not bool(np.asarray(rec["collided"]).any())
    assert np.isfinite(np.asarray(rec["uncertainty_max"])).all()


@pytest.mark.slow
def test_full_stack_batched_matches_vmapped_single(global_plan):
    """closed_loop_full_stack_batched (batched Pallas propagation +
    hybrid mega solve) vs vmap of the per-scenario pipeline (f64 reference
    propagation + vmap solver).  Zero noise => deterministic comparison;
    the f32 kernel path tracks the f64 reference at the usual 1e-3-level
    bar per cycle."""
    p = dataclasses.replace(SolverParams(), horizon=8, max_iterations=3)
    cp = dataclasses.replace(CostmapParams(), rows=32, cols=24, window_radius=5)
    noise = NoiseParams(0.0, 0.0, 0.0)

    gm = np.zeros((128, 128), np.float32)
    gm[20:40, 20:40] = 100.0
    ggeom = gridmap.make_geom([130.0, -280.0], 1.0, 128, 128, dtype=jnp.float64)

    from cilqr_tpu.models import reference_path as rp
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    sc = scenarios.Scenario("t", np.array([[120.0, -305.0, 0.0]]))
    ob, obs_xyyaw, obs_size, obs_mask = runner.build_scenario_inputs(p, sc, jnp.float64)

    B = 3
    rng = np.random.default_rng(13)
    x0s = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.3, (B, 4))
    )
    n_cycles = 4
    gm64 = jnp.asarray(gm, jnp.float64)

    xf_b, rec_b = plant.closed_loop_full_stack_batched(
        p, cp, noise, gm64, ggeom, plan, n, x0s, jax.random.key(3), n_cycles,
        obstacles=ob, obs_xyyaw=obs_xyyaw, obs_size=obs_size, obs_mask=obs_mask,
    )
    xf_s, rec_s = jax.vmap(
        lambda x0, k: plant.closed_loop_full_stack(
            p, cp, noise, gm64, ggeom, plan, n, x0, k, n_cycles,
            obstacles=ob, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
            obs_mask=obs_mask,
        )
    )(x0s, jax.random.split(jax.random.key(3), B))

    assert rec_b["start_pos"].shape == (n_cycles, B, 4)
    # single path records are (B, n_cycles, ...)
    np.testing.assert_allclose(
        np.asarray(xf_b), np.asarray(xf_s), rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(rec_b["J"]), np.asarray(rec_s["J"]).T, rtol=2e-3, atol=1e-2
    )
    np.testing.assert_array_equal(
        np.asarray(rec_b["collided"]), np.asarray(rec_s["collided"]).T
    )
    np.testing.assert_allclose(
        np.asarray(rec_b["uncertainty_max"]),
        np.asarray(rec_s["uncertainty_max"]).T,
        rtol=1e-4, atol=1e-2,
    )
