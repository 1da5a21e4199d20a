"""Fully-fused LM-iteration kernel (ops/lm_pallas) vs the vmap reference.

Runs the Pallas interpreter on CPU (auto-selected by
``lm_pallas._auto_interpret``).  Interpret-mode numerics match XLA CPU
op-for-op, so parity here is tight; on real TPU hardware the paths agree to
f32 rounding except for closest-point argmin tie flips (see the module
docstring of ops/lm_pallas.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import (
    obstacles as obs_mod,
    reference_path as rp,
    solver,
    solver_batched,
    uncertainty as unc_mod,
)
from cilqr_tpu.ops import lm_pallas, riccati_pallas
import pytest


def _setup(params, global_plan, B, horizon=8, max_iterations=4, seed=61):
    # NOTE on sizes: interpret-mode Pallas cost is almost entirely
    # trace+compile (a cached re-call is ~0.3 s), dominated by the statically
    # unrolled closest-point sample table (S = num_of_local_wpts *
    # closest_point_samples_per_wpt).  S=40 keeps the chunked min-tree
    # structure while cutting per-test compile ~3x; the production S=200
    # config is exercised on real TPU by scripts/drive_e2e.py and bench.py.
    p = dataclasses.replace(
        params, horizon=horizon, max_iterations=max_iterations,
        num_of_local_wpts=8, closest_point_samples_per_wpt=5,
    )
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    egos = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.4, (B, 4)),
        jnp.float32,
    )
    U0 = jnp.broadcast_to(
        solver.initial_controls(p, dtype=jnp.float32), (B, p.horizon, 2)
    )
    return p, plan, n, egos, U0


@pytest.mark.slow
def test_mega_matches_vmap_path_full_world(params, global_plan):
    """Obstacles + uncertainty map: the complete in-kernel derivative stack."""
    B = riccati_pallas.TILE
    p, plan, n, egos, U0 = _setup(params, global_plan, B)
    ob = obs_mod.make_static_obstacles(
        p, [[112.0, -305.5], [125.0, -304.6]], [[3.63, 1.84]] * 2, [0.0, 0.3],
        dtype=jnp.float32,
    )
    unc = unc_mod.make_uncertainty_map(
        np.random.default_rng(0).uniform(0.0, 100.0, (48, 32)),
        [10.0, 0.0], 0.2, np.asarray(egos[0, :2]), float(egos[0, 3]),
        dtype=jnp.float32,
    )

    got = solver_batched.run_steps_batched(
        p, plan, n, egos, U0, obstacles=ob, unc_map=unc, impl="mega"
    )

    S = 48  # full B through the vmap reference is slow on CPU
    want = jax.vmap(lambda e, u: solver.run_step(p, plan, n, e, u, ob, unc))(
        egos[:S], U0[:S]
    )
    np.testing.assert_array_equal(
        np.asarray(got.iterations[:S]), np.asarray(want.iterations)
    )
    np.testing.assert_allclose(np.asarray(got.U[:S]), np.asarray(want.U), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.X[:S]), np.asarray(want.X), rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.J[:S]), np.asarray(want.J), rtol=1e-4)


@pytest.mark.slow
def test_mega_no_world_matches_vmap_path(params, global_plan):
    """Static switches: kernel specialized without obstacle/uncertainty code."""
    B = riccati_pallas.TILE
    p, plan, n, egos, U0 = _setup(params, global_plan, B, seed=7)
    got = solver_batched.run_steps_batched(p, plan, n, egos, U0, impl="mega")
    S = 32
    want = jax.vmap(lambda e, u: solver.run_step(p, plan, n, e, u))(egos[:S], U0[:S])
    np.testing.assert_array_equal(
        np.asarray(got.iterations[:S]), np.asarray(want.iterations)
    )
    np.testing.assert_allclose(np.asarray(got.U[:S]), np.asarray(want.U), rtol=2e-3, atol=2e-3)


def test_prep_obstacles_quadratic_form(params):
    """G = R^T diag(a^-2, b^-2) R reproduces Obstacle.cpp:39-112's c value."""
    p = dataclasses.replace(params, horizon=4)
    ob = obs_mod.make_static_obstacles(
        p, [[3.0, 1.0]], [[4.0, 2.0]], [0.7], speeds=[2.0], dtype=jnp.float32
    )
    payload = lm_pallas.prep_obstacles(p, ob)
    M = ob.dims.shape[0]
    assert payload.shape == (M * 6, p.horizon)
    g11, g12, g22, px, py, msk = (np.asarray(payload[i, 0]) for i in range(6))
    assert msk == 1.0 and px == 3.0 and py == 1.0

    # quadratic form vs the explicit rotate-then-scale reference math
    oth, ov = 0.7, 2.0
    a = 4.0 / 2 + abs(ov * np.cos(oth)) * p.t_safe + p.s_safe_a + p.ego_rad
    b = 2.0 / 2 + abs(ov * np.sin(oth)) * p.t_safe + p.s_safe_b + p.ego_rad + 1.0
    for dxy in ([1.3, -0.4], [-2.0, 0.9]):
        dx = np.cos(oth) * dxy[0] + np.sin(oth) * dxy[1]
        dy = -np.sin(oth) * dxy[0] + np.cos(oth) * dxy[1]
        want = dx * dx / a**2 + dy * dy / b**2
        got = g11 * dxy[0] ** 2 + 2 * g12 * dxy[0] * dxy[1] + g22 * dxy[1] ** 2
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_prep_unc_map_corners_and_frame(params):
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 100, (9, 7))
    unc = unc_mod.make_uncertainty_map(vals, [1.0, 0.5], 0.25, [2.0, -1.0], 0.3,
                                       dtype=jnp.float32)
    m4, scl, (H, W) = lm_pallas.prep_unc_map(unc)
    assert (H, W) == (9, 7)
    K = m4.shape[0] // 4
    flat = np.asarray(vals, np.float32).reshape(-1)
    m4n = np.asarray(m4).reshape(4, K * 128)[:, : H * W]
    np.testing.assert_array_equal(m4n[0], flat)
    np.testing.assert_array_equal(m4n[1][:-1], flat[1:])
    np.testing.assert_array_equal(m4n[2][: -W], flat[W:])
    s = np.asarray(scl)[0]
    np.testing.assert_allclose(s[2], np.cos(0.3), rtol=1e-6)
    np.testing.assert_allclose(s[6], 4.0, rtol=1e-6)  # 1/res


@pytest.mark.slow
def test_inkernel_loop_matches_per_iteration_form(params, global_plan):
    """The whole-LM-loop kernel (_opt_kernel) vs the one-kernel-call-per-
    iteration form with XLA accept/reject bookkeeping: identical iteration
    counts and trajectories (same update order by construction)."""
    B = riccati_pallas.TILE
    p, plan, n, egos, U0 = _setup(params, global_plan, B, horizon=4,
                                  max_iterations=3, seed=23)
    plans = jax.vmap(lambda e: rp.get_local_plan(p, plan, n, e))(egos)
    a = lm_pallas.fused_optimize(p, plans, egos, U0, inkernel_loop=True)
    b = lm_pallas.fused_optimize(p, plans, egos, U0, inkernel_loop=False)
    for xa, xb, name in zip(a, b, ("X", "U", "it", "J", "lamb")):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=1e-6, atol=1e-6,
            err_msg=name,
        )


@pytest.mark.slow
def test_mega_arbitrary_batch_padding(params, global_plan):
    """Non-tile batch sizes pad internally and slice back."""
    B = 100
    p, plan, n, egos, U0 = _setup(params, global_plan, B, horizon=4,
                                  max_iterations=2, seed=11)
    res = solver_batched.run_steps_batched(p, plan, n, egos, U0, impl="mega")
    assert res.U.shape == (B, p.horizon, 2)
    assert np.isfinite(np.asarray(res.U)).all()

    # B=1 — the serving fast path (bench device_single_solve_ms_mega_b1,
    # ARCHITECTURE §8): one padded tile whose padding lanes replay lane 0.
    # Lane 0's result must be invariant to its tile co-tenants.
    res1 = solver_batched.run_steps_batched(
        p, plan, n, egos[:1], U0[:1], impl="mega")
    assert res1.U.shape == (1, p.horizon, 2)
    np.testing.assert_allclose(
        np.asarray(res1.U[0]), np.asarray(res.U[0]), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res1.iterations[0]), np.asarray(res.iterations[0]))
