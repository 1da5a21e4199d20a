"""Marginal per-LM-iteration cost via iteration-count slope.

Runs the solver body a fixed K times (no early exit) for K in {4, 12} and
reports (t12 - t4) / 8 — dispatch/constant overheads cancel.  Also slopes
the derivs-only and kernel-only loops the same way.
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import costs as costs_mod, dynamics
from cilqr_tpu.models.reference_path import get_local_plan
from cilqr_tpu.ops import riccati_pallas
from cilqr_tpu.sim.example_scenario import example_scenario
from cilqr_tpu.utils.params import SolverParams


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    plan_xy, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)

    rng = np.random.default_rng(2)
    egos = jnp.asarray(np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), jnp.float32)
    U0s = jnp.broadcast_to(U0, (B,) + U0.shape)

    plans = jax.jit(jax.vmap(lambda e: get_local_plan(p, plan_xy, n, e)))(egos)
    X0 = jax.jit(jax.vmap(lambda e, u: dynamics.rollout(p, e, u)))(egos, U0s)
    lamb0 = jnp.full((B,), p.lamb_init, jnp.float32)

    derivs_J = jax.vmap(
        lambda pl_, Xi, Ui: costs_mod.all_cost_derivs_and_J(p, pl_, Xi, Ui, obstacles, unc)
    )

    def body_full(i, carry):
        X, U, lamb = carry
        d, J = derivs_J(plans, X, U)
        Xn, Un = riccati_pallas.backward_forward_batched(p, d, X, U, lamb)
        return (Xn, Un, lamb + 0.0 * J)

    def body_derivs(i, carry):
        X, U, lamb = carry
        d, J = derivs_J(plans, X, U)
        # fold derivs back so the loop is sequential & nothing is DCE'd
        X = X + 1e-12 * jnp.pad(d.l_x, ((0, 0), (0, 1), (0, 0)))
        return (X, U, lamb + 1e-12 * J)

    def body_kernel(i, carry):
        X, U, lamb = carry
        Xn, Un = riccati_pallas.backward_forward_batched(p, _D, X, U, lamb)
        return (Xn, Un, lamb)

    _D, _ = jax.jit(lambda X, U: derivs_J(plans, X, U))(X0, U0s)

    for name, body in [("full body", body_full), ("derivs only", body_derivs), ("kernel only", body_kernel)]:
        ts = {}
        for K in (4, 12):
            f = jax.jit(lambda X, U, l, K=K, b=body: jax.lax.fori_loop(0, K, b, (X, U, l)))
            ts[K] = timeit(f, X0, U0s, lamb0)
        slope = (ts[12] - ts[4]) / 8
        print(f"{name:12s}: K=4 {ts[4]*1e3:7.3f} ms  K=12 {ts[12]*1e3:7.3f} ms  -> {slope*1e3:7.3f} ms/iter")


if __name__ == "__main__":
    main()
