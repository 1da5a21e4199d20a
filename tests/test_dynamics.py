"""Dynamics parity vs the float64 oracle + structural checks."""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import dynamics
from oracle import oracle_cilqr as oracle


def test_step_matches_oracle(params):
    rng = np.random.default_rng(0)
    for _ in range(50):
        x = rng.uniform([-50, -50, 0, -3.2], [50, 50, 12, 3.2])
        u = rng.uniform([-8, -2], [4, 2])  # deliberately violates limits
        got = dynamics.step(params, jnp.asarray(x), jnp.asarray(u))
        want = oracle.forward_simulate(params, x, u)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-12)


def test_rollout_matches_oracle(params):
    rng = np.random.default_rng(1)
    x0 = np.array([10.0, -5.0, 3.0, 0.3])
    U = rng.normal(0.0, 1.0, (params.horizon, 2))
    got = dynamics.rollout(params, jnp.asarray(x0), jnp.asarray(U))
    want = oracle.rollout(params, x0, U)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_jacobians_match_oracle(params):
    rng = np.random.default_rng(2)
    v = rng.uniform(0, 10, params.horizon)
    th = rng.uniform(-3, 3, params.horizon)
    a = rng.uniform(-5, 2, params.horizon)
    fx, fu = dynamics.jacobians(params, jnp.asarray(v), jnp.asarray(th), jnp.asarray(a))
    for i in range(params.horizon):
        np.testing.assert_allclose(np.asarray(fx[i]), oracle.get_A(params, v[i], th[i], a[i]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(fu[i]), oracle.get_B(params, th[i]), atol=1e-12)


def test_jacobians_match_autodiff_interior(params):
    """Away from the clamp boundaries the analytic fx/fu must equal autodiff
    of step() (the analytic forms ignore the clamps, as the C++ does)."""
    x = jnp.array([1.0, 2.0, 5.0, 0.4])
    u = jnp.array([0.5, 0.1])
    J_x = jax.jacobian(lambda xx: dynamics.step(params, xx, u))(x)
    J_u = jax.jacobian(lambda uu: dynamics.step(params, x, uu))(u)
    fx, fu = dynamics.jacobians(
        params, x[2:3], x[3:4], u[0:1]
    )
    # Analytic A ignores dv'/dv clamping & yaw-rate bound coupling; at an
    # interior point only the d(theta')/dv term differs (clamped yawrate
    # depends on v in autodiff). Compare the rows that must agree.
    np.testing.assert_allclose(np.asarray(J_x[:3]), np.asarray(fx[0][:3]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(J_u), np.asarray(fu[0]), atol=1e-9)


def test_step_vmaps(params):
    xs = jnp.ones((16, 4))
    us = jnp.ones((16, 2)) * 0.1
    out = jax.vmap(lambda x, u: dynamics.step(params, x, u))(xs, us)
    assert out.shape == (16, 4)
