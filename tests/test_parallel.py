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
