"""Associative-scan Riccati: algebra locked against its sequential oracle,
and against the reference recursion in the small-lambda regime."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.models import costs as costs_mod, obstacles as obs_mod, solver
from cilqr_tpu.models import reference_path as rp
from cilqr_tpu.ops import riccati_pscan
from cilqr_tpu.utils.params import SolverParams


def _problem(p, ego, global_plan, with_obstacles=True):
    plan_xy, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    plan = rp.get_local_plan(p, plan_xy, n, jnp.asarray(ego))
    ob = None
    if with_obstacles:
        ob = obs_mod.make_static_obstacles(
            p, np.array([[112.0, -304.0]]), np.array([[4.5, 2.0]]),
            np.array([0.1]), dtype=jnp.float64)
    U = solver.initial_controls(p, dtype=jnp.float64)
    from cilqr_tpu.models import dynamics
    X = dynamics.rollout(p, jnp.asarray(ego), U)
    d = costs_mod.all_cost_derivs(p, plan, X, U, ob, None)
    return plan, X, U, d, ob, plan_xy, n


# two horizons x two damping decades lock the algebra; the combine is
# N/lambda-independent so a denser grid only re-pays compile time
@pytest.mark.parametrize("lamb", [1.0, 1e-4])
@pytest.mark.parametrize("N", [13, 50])
@pytest.mark.slow
def test_pscan_matches_sequential_standard(ego_state, global_plan, N, lamb):
    """The associative algebra is exact: pscan == sequential oracle of the
    same textbook damped recursion, any lambda, machine precision."""
    p = dataclasses.replace(SolverParams(), horizon=N)
    _, X, U, d, *_ = _problem(p, ego_state, global_plan)
    lam = jnp.asarray(lamb, jnp.float64)
    k_p, K_p = jax.jit(riccati_pscan.backward_pscan, static_argnums=0)(p, d, X, U, lam)
    k_s, K_s = riccati_pscan.backward_standard_seq(p, d, X, U, lam)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_pscan_approaches_reference_at_small_lambda(ego_state, global_plan):
    """lambda -> 0 is the regime where the reference's M Q_uu M sandwich
    equals the textbook M~ propagation: gains must converge."""
    p = dataclasses.replace(SolverParams(), horizon=20)
    _, X, U, d, *_ = _problem(p, ego_state, global_plan)
    for lamb, tol in ((1e-3, 2e-2), (1e-6, 1e-4)):
        lam = jnp.asarray(lamb, jnp.float64)
        k_p, K_p = riccati_pscan.backward_pscan(p, d, X, U, lam)
        k_r, K_r = solver.backward_from_derivs(p, d, X, U, lam)
        np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_r), rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_r), rtol=tol, atol=tol)


def test_full_solve_with_pscan_backward(ego_state, global_plan):
    """End-to-end: backward_impl='pscan' produces a converged, feasible
    solve close to the reference-semantics trajectory."""
    p_ref = dataclasses.replace(SolverParams(), horizon=40)
    p_ps = dataclasses.replace(p_ref, backward_impl="pscan")
    plan_xy, n = rp.pad_global_plan(p_ref, global_plan, dtype=jnp.float64)
    ego = jnp.asarray(ego_state)
    U0 = solver.initial_controls(p_ref, dtype=jnp.float64)
    ob = obs_mod.make_static_obstacles(
        p_ref, np.array([[112.0, -304.0]]), np.array([[4.5, 2.0]]),
        np.array([0.1]), dtype=jnp.float64)

    r_ref = solver.run_step(p_ref, plan_xy, n, ego, U0, ob, None)
    r_ps = solver.run_step(p_ps, plan_xy, n, ego, U0, ob, None)
    assert np.isfinite(np.asarray(r_ps.X)).all()
    assert int(r_ps.iterations) <= p_ref.max_iterations
    # both converge to the same optimum within solver tolerance scales
    np.testing.assert_allclose(
        np.asarray(r_ps.X), np.asarray(r_ref.X), rtol=5e-2, atol=5e-2)
    assert abs(float(r_ps.J) - float(r_ref.J)) < 5e-2 * max(1.0, float(r_ref.J))
