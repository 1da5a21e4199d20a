"""Sharded batch solve on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import reference_path as rp, solver
from cilqr_tpu.parallel import batch as pbatch
import pytest


def test_mesh_has_8_devices():
    mesh = pbatch.make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_solve_matches_vmap(params, global_plan):
    mesh = pbatch.make_mesh()
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    B = 16
    rng = np.random.default_rng(31)
    egos = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(95, 125, B),
                rng.uniform(-306.5, -304.5, B),
                rng.uniform(1, 8, B),
                rng.uniform(-0.2, 0.2, B),
            ]
        )
    )
    U0 = jnp.broadcast_to(
        solver.initial_controls(params, dtype=jnp.float64), (B, params.horizon, 2)
    )

    fn, sharding = pbatch.make_sharded_solver(params, mesh)
    egos_sh = jax.device_put(egos, sharding)
    U0_sh = jax.device_put(U0, sharding)
    res, metrics = fn(plan, n, egos_sh, U0_sh)

    # must actually be sharded over the mesh
    assert len(res.U.sharding.device_set) == 8

    want = pbatch.batched_solve(params, plan, n, egos, U0)
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(want.U), atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.X), np.asarray(want.X), atol=1e-9)

    # psum-reduced metrics equal the global statistics
    np.testing.assert_allclose(float(metrics.mean_J), float(jnp.mean(want.J)), rtol=1e-9)
    np.testing.assert_allclose(float(metrics.max_J), float(jnp.max(want.J)), rtol=1e-9)
    np.testing.assert_allclose(
        float(metrics.mean_iterations),
        float(jnp.mean(want.iterations.astype(jnp.float64))),
        rtol=1e-9,
    )
    assert 0.0 <= float(metrics.converged_frac) <= 1.0


def test_sharded_solver_rejects_indivisible_batch(params, global_plan):
    mesh = pbatch.make_mesh()
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    fn, _ = pbatch.make_sharded_solver(params, mesh)
    egos = jnp.zeros((6, 4))
    U0 = jnp.zeros((6, params.horizon, 2))
    try:
        fn(plan, n, egos, U0)
        raised = False
    except ValueError:
        raised = True
    assert raised


@pytest.mark.slow
def test_sharded_full_stack_virtual_mesh():
    """make_sharded_full_stack on the virtual 8-device mesh: per-shard
    ground truth = closed_loop_full_stack_batched with fold_in(key, shard)
    (the key discipline shard_fn applies via axis_index); record leaves
    come back gathered on axis 1, the summary psum is replicated.  Fast
    tier: tiny shapes, 2 cycles."""
    import dataclasses

    from cilqr_tpu.ops import gridmap as gm_mod
    from cilqr_tpu.sim import plant, scenarios
    from cilqr_tpu.sim.runner import build_scenario_inputs
    from cilqr_tpu.utils.params import CostmapParams, NoiseParams, SolverParams

    p = dataclasses.replace(
        SolverParams(), horizon=8, max_iterations=3,
        max_global_plan_points=128, num_of_local_wpts=8)
    cp = dataclasses.replace(CostmapParams(), rows=16, cols=16, window_radius=4)
    mesh = pbatch.make_mesh()
    sc = scenarios.get_scenario("success1")
    ob, obs_xyyaw, obs_size, obs_mask = build_scenario_inputs(p, sc, jnp.float32)
    s = np.linspace(0.0, 60.0, 61)
    plan_np = np.stack([90.0 + s, -306.0 + 0.02 * s], axis=1)
    plan, n = rp.pad_global_plan(p, plan_np, dtype=jnp.float32)
    gmap = jnp.zeros((32, 32), jnp.float32)
    ggeom = gm_mod.make_geom([100.0, -300.0], 2.0, 32, 32, dtype=jnp.float32)

    B, n_cycles = 16, 2
    x0s = jnp.asarray(
        np.asarray(sc.start)[None, :]
        + np.random.default_rng(13).normal(0, 0.2, (B, 4)), jnp.float32)
    fn, sharding = pbatch.make_sharded_full_stack(
        p, cp, mesh, n_cycles=n_cycles, obstacles=ob,
        obs_xyyaw=obs_xyyaw, obs_size=obs_size, obs_mask=obs_mask)
    key = jax.random.key(5)
    xf, rec, summary = fn(gmap, ggeom, plan, n,
                          jax.device_put(x0s, sharding), key)
    assert len(xf.sharding.device_set) == 8
    assert rec["J"].shape == (n_cycles, B)

    bs = B // 8
    xf_ref, J_ref = [], []
    for i in range(8):
        xf_i, rec_i = plant.closed_loop_full_stack_batched(
            p, cp, NoiseParams(), gmap, ggeom, plan, n,
            x0s[i * bs:(i + 1) * bs], jax.random.fold_in(key, i), n_cycles,
            obstacles=ob, obs_xyyaw=obs_xyyaw, obs_size=obs_size,
            obs_mask=obs_mask)
        xf_ref.append(np.asarray(xf_i))
        J_ref.append(np.asarray(rec_i["J"]))
    np.testing.assert_allclose(
        np.asarray(xf), np.concatenate(xf_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rec["J"]), np.concatenate(J_ref, axis=1), rtol=1e-5)
    np.testing.assert_allclose(
        float(summary[0]),
        float(np.concatenate(J_ref, axis=1)[-1].sum() / B), rtol=1e-6)
