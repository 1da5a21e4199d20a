"""Fused Riccati kernel parity vs the XLA scan path (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import costs as costs_mod, dynamics, reference_path as rp, solver
from cilqr_tpu.ops import riccati_pallas
import pytest


@pytest.mark.slow
def test_backward_kernel_matches_scan(params, global_plan):
    p = dataclasses.replace(params, horizon=12)
    B = riccati_pallas.TILE  # one tile
    plan, n = rp.pad_global_plan(p, global_plan, dtype=jnp.float32)

    rng = np.random.default_rng(51)
    egos = jnp.asarray(
        np.array([100.0, -305.6, 4.0, 0.05])[None, :]
        + rng.normal(0, 0.5, (B, 4)),
        jnp.float32,
    )
    U0 = jnp.asarray(rng.normal(0, 0.5, (B, p.horizon, 2)), jnp.float32)
    lamb = jnp.asarray(rng.uniform(0.1, 10.0, (B,)), jnp.float32)

    plans = jax.vmap(lambda e: rp.get_local_plan(p, plan, n, e))(egos)
    X = jax.vmap(lambda e, u: dynamics.rollout(p, e, u))(egos, U0)
    d = jax.vmap(lambda pl_, Xi, Ui: costs_mod.all_cost_derivs(p, pl_, Xi, Ui))(
        plans, X, U0
    )

    k_want, K_want = jax.vmap(
        lambda di, Xi, Ui, li: solver.backward_from_derivs(p, di, Xi, Ui, li)
    )(d, X, U0, lamb)

    k_got, K_got = riccati_pallas.backward_batched(p, d, X, U0, lamb, None, True)

    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_want), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(K_got), np.asarray(K_want), rtol=2e-4, atol=2e-4)


def test_backward_kernel_rejects_bad_batch(params):
    p = dataclasses.replace(params, horizon=4)
    d = costs_mod.CostDerivs(
        jnp.zeros((100, 4, 4)), jnp.zeros((100, 4, 4, 4)),
        jnp.zeros((100, 4, 2)), jnp.zeros((100, 4, 2, 2)), jnp.zeros((100, 4, 2, 4)),
    )
    try:
        riccati_pallas.backward_batched(
            p, d, jnp.zeros((100, 5, 4)), jnp.zeros((100, 4, 2)), jnp.ones((100,)), None, True
        )
        raised = False
    except ValueError:
        raised = True
    assert raised
