"""End-to-end solver parity: full CILQR solve vs the float64 oracle.

This is the BASELINE.md parity bar: control trajectories within 1e-3.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import obstacles as obs_mod, reference_path as rp, solver
from cilqr_tpu.ops.eig2x2 import eigh2x2, regularized_inverse
from oracle import oracle_cilqr as oracle


def test_eig2x2_against_numpy():
    rng = np.random.default_rng(11)
    for _ in range(200):
        a, b, c = rng.normal(0, 5, 3)
        M = np.array([[a, b], [b, c]])
        w, V = eigh2x2(jnp.asarray(M))
        w = np.asarray(w)
        V = np.asarray(V)
        want = np.sort(np.linalg.eigvalsh(M))
        np.testing.assert_allclose(np.sort(w), want, atol=1e-10)
        # V diag(w) V^T == M
        np.testing.assert_allclose(V @ np.diag(w) @ V.T, M, atol=1e-10)


def test_regularized_inverse_matches_reference_recipe():
    rng = np.random.default_rng(12)
    for lamb in (1e-3, 1.0, 100.0):
        a, b, c = rng.normal(0, 2, 3)
        M = np.array([[a, b], [b, c]])
        got = np.asarray(regularized_inverse(jnp.asarray(M), jnp.asarray(lamb)))
        w, V = np.linalg.eig(M)
        want = V @ np.diag(1.0 / (np.maximum(np.real(w), 0) + lamb)) @ V.T
        np.testing.assert_allclose(got, want, atol=1e-9)


def _solve_both(params, global_plan, ego_state, obstacles=None, oracle_obs=None):
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    U0 = solver.initial_controls(params, dtype=jnp.float64)
    res = solver.run_step_jit(
        params, plan, n, jnp.asarray(ego_state), U0, obstacles=obstacles
    )
    oX, oU, _, oiters, oJ, _ = oracle.run_step(
        params, global_plan, np.asarray(ego_state), np.asarray(U0), obstacles=oracle_obs
    )
    return res, (oX, oU, oiters, oJ)


import dataclasses

import pytest


@pytest.mark.parametrize("horizon", [30, 40, 50])
def test_solver_parity_tracking_only(params, global_plan, ego_state, horizon):
    """BASELINE configs 1-2: N=30 reference solve and N=50 full horizon."""
    p = dataclasses.replace(params, horizon=horizon)
    res, (oX, oU, oiters, oJ) = _solve_both(p, global_plan, ego_state)
    # +-1: the inherent ~1e-4 polyfit-conditioning residual can flip one
    # accept/reject decision near convergence (see test_reference_path)
    assert abs(int(res.iterations) - oiters) <= 1
    np.testing.assert_allclose(float(res.J), oJ, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.U), oU, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.X), oX, atol=1e-3)


def test_closed_loop_parity_vs_oracle(params, global_plan, ego_state):
    """Five noise-free receding-horizon cycles: JAX closed loop (scan) vs
    chaining the float64 oracle's run_step + forward_simulate."""
    import jax

    from cilqr_tpu.sim import plant
    from cilqr_tpu.utils.params import NoiseParams

    p = dataclasses.replace(params, horizon=15, max_iterations=6)
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float64)
    x0 = jnp.asarray(ego_state)

    xf, rec = plant.closed_loop_jit(
        p, NoiseParams(0.0, 0.0, 0.0), plan, n, x0, jax.random.key(0), 5
    )

    state = np.asarray(ego_state, dtype=np.float64)
    U = np.asarray(solver.initial_controls(p, dtype=jnp.float64))
    for t in range(5):
        np.testing.assert_allclose(np.asarray(rec.start_pos[t]), state, atol=2e-3)
        X, U, _, _, _, _ = oracle.run_step(p, global_plan, state, U)
        np.testing.assert_allclose(np.asarray(rec.U[t]), U, atol=2e-3)
        state = oracle.forward_simulate(p, state, U[0])
    np.testing.assert_allclose(np.asarray(xf), state, atol=2e-3)


def test_solver_parity_with_obstacles(params, global_plan, ego_state):
    centers = [[115.0, -306.0]]
    sizes = [[3.63, 1.84]]
    yaws = [0.0]
    ob = obs_mod.make_static_obstacles(params, centers, sizes, yaws, dtype=jnp.float64)
    oracle_obs = [
        (
            np.tile(np.asarray(sizes[0]), (params.horizon, 1)),
            np.tile(np.array([115.0, -306.0, 0.0, 0.0]), (params.horizon, 1)),
        )
    ]
    res, (oX, oU, oiters, oJ) = _solve_both(
        params, global_plan, ego_state, obstacles=ob, oracle_obs=oracle_obs
    )
    # The inherent ~1e-4 polyfit-conditioning residual (see
    # test_reference_path) can flip one accept/reject decision near the
    # lambda-abort; trajectories still agree far inside the parity bar.
    assert abs(int(res.iterations) - oiters) <= 1
    np.testing.assert_allclose(np.asarray(res.U), oU, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.X), oX, atol=1e-3)


def test_solver_vmap_batches(params, global_plan):
    """The whole solve vmaps over scenarios (the P8 batch axis)."""
    plan, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    U0 = solver.initial_controls(params, dtype=jnp.float64)
    egos = jnp.asarray(
        np.array(
            [
                [100.0, -305.6, 4.0, 0.05],
                [110.0, -305.0, 6.0, 0.0],
                [120.0, -304.5, 2.0, -0.1],
                [95.0, -306.2, 5.0, 0.1],
            ]
        )
    )

    batched = jax.jit(
        jax.vmap(lambda e: solver.run_step(params, plan, n, e, U0)),
    )
    out = batched(egos)
    assert out.U.shape == (4, params.horizon, 2)

    # lane 0 must equal the unbatched solve exactly
    single = solver.run_step_jit(params, plan, n, egos[0], U0)
    np.testing.assert_allclose(np.asarray(out.U[0]), np.asarray(single.U), atol=1e-9)
    # per-lane iteration counts preserved under vmap
    singles = [solver.run_step_jit(params, plan, n, egos[i], U0) for i in range(4)]
    for i, s in enumerate(singles):
        assert int(out.iterations[i]) == int(s.iterations)


def test_solver_f32_close_to_f64(params, global_plan, ego_state):
    plan64, n = rp.pad_global_plan(params, global_plan, dtype=jnp.float64)
    plan32 = plan64.astype(jnp.float32)
    U0_64 = solver.initial_controls(params, dtype=jnp.float64)
    r64 = solver.run_step_jit(params, plan64, n, jnp.asarray(ego_state), U0_64)
    r32 = solver.run_step_jit(
        params,
        plan32,
        n,
        jnp.asarray(ego_state, dtype=jnp.float32),
        U0_64.astype(jnp.float32),
    )
    # f32 throughput mode stays within loose tolerance of f64 on controls
    np.testing.assert_allclose(np.asarray(r32.U), np.asarray(r64.U), atol=5e-2)
