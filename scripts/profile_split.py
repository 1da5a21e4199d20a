"""Phase-split profiling of the fused batched solver on the real chip.

Times, per LM iteration at BENCH_BATCH:
  * derivs_J      — the XLA cost-derivative region (incl. closest-point field)
  * bw+fw kernel  — backward_forward_batched (incl. _to_tiles transposes)
  * accept/reject — the remaining while-loop body glue
  * full solve    — run_steps_batched end-to-end for reference

Usage: python scripts/profile_split.py  [BENCH_BATCH=4096]
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.models import costs as costs_mod, dynamics, solver_batched
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
    lamb = jnp.full((B,), p.lamb_init, jnp.float32)

    derivs_J = jax.jit(
        jax.vmap(
            lambda pl_, Xi, Ui: costs_mod.all_cost_derivs_and_J(
                p, pl_, Xi, Ui, obstacles, unc
            )
        )
    )
    t_derivs = timeit(derivs_J, plans, X0, U0s)
    d, J = derivs_J(plans, X0, U0s)

    bf = jax.jit(lambda d_, X_, U_, l_: riccati_pallas.backward_forward_batched(p, d_, X_, U_, l_))
    t_bf = timeit(bf, d, X0, U0s, lamb)

    # derivs without the uncertainty map / without obstacles, to split further
    derivs_nounc = jax.jit(
        jax.vmap(lambda pl_, Xi, Ui: costs_mod.all_cost_derivs_and_J(p, pl_, Xi, Ui, obstacles, None))
    )
    t_nounc = timeit(derivs_nounc, plans, X0, U0s)
    derivs_track = jax.jit(
        jax.vmap(lambda pl_, Xi, Ui: costs_mod.all_cost_derivs_and_J(p, pl_, Xi, Ui, None, None))
    )
    t_track = timeit(derivs_track, plans, X0, U0s)

    # plan fit (once per solve)
    t_plan = timeit(
        jax.jit(jax.vmap(lambda e: get_local_plan(p, plan_xy, n, e))), egos
    )

    full = jax.jit(lambda e, u: solver_batched.run_steps_batched(p, plan_xy, n, e, u, obstacles, unc))
    t_full = timeit(full, egos, U0s, iters=5)
    out = full(egos, U0s)
    mean_it = float(jnp.mean(out.iterations.astype(jnp.float32)))

    print(f"B={B} N={p.horizon} device={jax.devices()[0].platform}")
    print(f"plan fit (once/solve)     : {t_plan*1e3:8.3f} ms")
    print(f"derivs_J full   (per it)  : {t_derivs*1e3:8.3f} ms")
    print(f"  - tracking+ctrl only    : {t_track*1e3:8.3f} ms")
    print(f"  - + obstacles           : {t_nounc*1e3:8.3f} ms")
    print(f"  - uncertainty delta     : {(t_derivs-t_nounc)*1e3:8.3f} ms")
    print(f"bw+fw kernel    (per it)  : {t_bf*1e3:8.3f} ms")
    print(f"mean LM iterations        : {mean_it:8.2f}")
    print(f"full solve                : {t_full*1e3:8.3f} ms  ({B/t_full:,.0f} solves/s)")
    print(f"  iter-accounted (derivs+kernel)*it: {(t_derivs+t_bf)*mean_it*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
