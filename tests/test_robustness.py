"""Failure-mode behavior: barrier overflow, degenerate inputs, batched loop."""

import dataclasses
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import obstacles as obs_mod, reference_path as rp, solver
from cilqr_tpu.ops import riccati_pallas
from cilqr_tpu.sim import plant
from cilqr_tpu.utils.params import NoiseParams
import pytest


def test_solver_survives_barrier_overflow(params, global_plan):
    """Ego starting *inside* an obstacle: the f32 barrier overflows to inf,
    the backward pass goes non-finite, every candidate is rejected (NaN < J
    is false), lambda escalates and the loop aborts — the result must be the
    finite initial rollout, never NaN (the analog of the reference's
    eigensolver-failure abort, iLQR.cpp:159-162,233-236)."""
    p = dataclasses.replace(params, horizon=20)
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float32)
    ego = jnp.asarray([115.0, -305.0, 2.0, 0.0], jnp.float32)  # on the obstacle
    ob = obs_mod.make_static_obstacles(
        p, [[115.0, -305.0]], [[3.63, 1.84]], [0.0], dtype=jnp.float32
    )
    res = solver.run_step_jit(
        p, plan, n, ego, solver.initial_controls(p, dtype=jnp.float32), obstacles=ob
    )
    assert np.isfinite(np.asarray(res.U)).all()
    assert np.isfinite(np.asarray(res.X)).all()


def test_solver_handles_two_point_plan(params):
    """Degenerate global plan (2 points): window clamps, polyfit degenerates
    to a near-constant — solve must stay finite."""
    p = dataclasses.replace(params, horizon=10, max_iterations=4)
    plan, n = rp.pad_global_plan(
        p, np.array([[0.0, 0.0], [1.0, 0.1]]), dtype=jnp.float64
    )
    res = solver.run_step_jit(
        p, plan, n, jnp.asarray([0.0, 0.0, 2.0, 0.0]), solver.initial_controls(p, dtype=jnp.float64)
    )
    assert np.isfinite(np.asarray(res.U)).all()


@pytest.mark.slow
def test_closed_loop_batched(params, global_plan):
    p = dataclasses.replace(params, horizon=8, max_iterations=3,
                            num_of_local_wpts=8, closest_point_samples_per_wpt=5)
    B = riccati_pallas.TILE
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float32)
    rng = np.random.default_rng(81)
    x0s = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :] + rng.normal(0, 0.3, (B, 4)),
        jnp.float32,
    )

    orig = riccati_pallas.backward_forward_batched
    with mock.patch.object(
        riccati_pallas,
        "backward_forward_batched",
        lambda pp, d, X, U, lamb, interpret=False: orig(pp, d, X, U, lamb, True),
    ):
        xf, rec = plant.closed_loop_batched(
            p, NoiseParams(0.0, 0.0, 0.0), plan, n, x0s, jax.random.key(0), 5
        )
    assert xf.shape == (B, 4)
    assert rec["start_pos"].shape == (5, B, 4)
    assert np.isfinite(np.asarray(xf)).all()
    # forward progress on average
    assert float(jnp.mean(xf[:, 0] - x0s[:, 0])) > 1.0
