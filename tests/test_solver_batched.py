"""Fused batched solver path vs the reference vmap path (interpret kernel)."""

import dataclasses
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import obstacles as obs_mod, reference_path as rp, solver, solver_batched
from cilqr_tpu.ops import riccati_pallas
import pytest


@pytest.mark.slow
def test_batched_solver_matches_vmap_path(params, global_plan):
    # sized for compile time: interpret-mode cost is trace+compile of the
    # unrolled iteration loop, not execution (see test_lm_pallas._setup)
    p = dataclasses.replace(params, horizon=8, max_iterations=4,
                            num_of_local_wpts=8, closest_point_samples_per_wpt=5)
    B = riccati_pallas.TILE
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float32)
    rng = np.random.default_rng(61)
    egos = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.4, (B, 4)),
        jnp.float32,
    )
    U0 = jnp.broadcast_to(solver.initial_controls(p, dtype=jnp.float32), (B, p.horizon, 2))
    ob = obs_mod.make_static_obstacles(p, [[112.0, -305.5]], [[3.63, 1.84]], [0.0], dtype=jnp.float32)

    # interpret-mode kernel (CPU test env)
    orig = riccati_pallas.backward_forward_batched
    with mock.patch.object(
        riccati_pallas,
        "backward_forward_batched",
        lambda pp, d, X, U, lamb, interpret=False: orig(pp, d, X, U, lamb, True),
    ):
        got = solver_batched.run_steps_batched(p, plan, n, egos, U0, obstacles=ob)

    S = 64  # compare a slice against the exact vmap path (full B is slow on CPU)
    want = jax.vmap(lambda e, u: solver.run_step(p, plan, n, e, u, ob))(egos[:S], U0[:S])

    np.testing.assert_array_equal(np.asarray(got.iterations[:S]), np.asarray(want.iterations))
    np.testing.assert_allclose(np.asarray(got.U[:S]), np.asarray(want.U), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.X[:S]), np.asarray(want.X), rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.J[:S]), np.asarray(want.J), rtol=1e-4)


@pytest.mark.slow
def test_world_batched_obstacles_fall_back_to_two_phase(params, global_plan):
    """impl="mega" with PER-SCENARIO obstacle pytrees silently routes to the
    fully-batched two-phase pipeline (the mega kernel's obstacle payload is
    shared-world only) and matches the per-sample vmap reference."""
    import dataclasses

    from cilqr_tpu.models import obstacles as obs_mod, uncertainty as unc_mod

    p = dataclasses.replace(params, horizon=5, max_iterations=2,
                            num_of_local_wpts=8, closest_point_samples_per_wpt=5)
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    B = 4
    rng = np.random.default_rng(9)
    egos = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.2, (B, 4))
    )
    U0 = jnp.broadcast_to(solver.initial_controls(p, dtype=jnp.float64),
                          (B, p.horizon, 2))
    ob = obs_mod.make_static_obstacles(
        p, [[108.0, -305.5]], [[3.63, 1.84]], [0.1], dtype=jnp.float64
    )
    ob_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), ob
    )
    vals = jnp.asarray(rng.uniform(0, 100, (B, 12, 10)))
    geom1 = __import__("cilqr_tpu.ops.gridmap", fromlist=["x"]).make_geom(
        [104.0, -305.0], 0.5, 12, 10, dtype=jnp.float64
    )
    bc = lambda a: jnp.broadcast_to(jnp.asarray(a), (B,) + jnp.shape(a))
    um_b = unc_mod.UncertaintyMap(
        vals, jax.tree.map(bc, geom1),
        bc(jnp.asarray([100.0, -305.6])), bc(jnp.asarray(0.05)),
    )

    got = solver_batched.run_steps_batched(
        p, plan, n, egos, U0, ob_b, um_b, impl="mega", world_batched=True
    )
    want = jax.vmap(
        lambda e, u, v: solver.run_step(
            p, plan, n, e, u, ob,
            unc_mod.UncertaintyMap(v, geom1, jnp.asarray([100.0, -305.6]),
                                   jnp.asarray(0.05)),
        )
    )(egos, U0, vals)
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(want.iterations)
    )
    # two_phase runs the f32 Riccati kernel against the f64 reference
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(want.U),
                               rtol=2e-3, atol=2e-3)
