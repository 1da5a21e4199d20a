"""Serving-latency probe: can the mega kernel beat run_step at B=1?

The mega path (ops/lm_pallas) pads any B up to one 1024-lane tile, so a
B=1 solve runs a single tile whose padding lanes replay lane 0 — the tile
early-exits at the real lane's convergence iteration.  At ~67 us per
tile-iteration that predicts ~1-2 ms per solve vs the measured 5.7 ms on
the unfused ``run_step`` path (BENCH device_single_solve_ms) — a serving
play, not a throughput one.

Timing is the in-jit chained-slope method (benchmark.py chain_slope_ms):
k data-dependent solves inside one dispatch, slope between k1 and k2 —
the only method the axon tunnel cannot poison.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_serve_b1.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cilqr_tpu.models import solver, solver_batched
    from cilqr_tpu.sim.example_scenario import example_scenario
    from cilqr_tpu.utils.params import SolverParams

    p = dataclasses.replace(SolverParams(), horizon=50)
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)
    rng = np.random.default_rng(7)
    egos = jnp.asarray(
        np.asarray(ego)[None, :] + rng.normal(0, 0.3, (64, 4)), jnp.float32)

    def slope_ms(make_chain, reps=9, k1=4, k2=20):
        # NOTE: pick k2 so (k2-k1) * expected-per-solve >> the several-ms
        # axon RTT jitter, or the slope drowns (a first run at k2=20
        # measured -0.025 ms/solve for the mega chain — pure noise).
        c1, c2 = make_chain(k1), make_chain(k2)
        jax.block_until_ready(c1(egos[0], U0))
        jax.block_until_ready(c2(egos[0], U0))
        t1s, t2s = [], []
        for r in range(reps):
            e_in = egos[r % egos.shape[0]]
            t0 = time.perf_counter()
            jax.block_until_ready(c1(e_in, U0))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(c2(e_in, U0))
            t2s.append(time.perf_counter() - t0)
        return (float(np.median(t2s)) - float(np.median(t1s))) / (k2 - k1) * 1e3

    # baseline: the unfused run_step path (what bench.py reports today)
    def chain_ref(k):
        def f(e, u):
            def body(i, carry):
                e_, u_ = carry
                r = solver.run_step(p, plan, n, e_, u_, obstacles, unc)
                return (e_ + 1e-6 * r.X[1], r.U)
            return jax.lax.fori_loop(0, k, body, (e, u))
        return jax.jit(f)

    t_ref = slope_ms(chain_ref)
    print(f"run_step (unfused)      : {t_ref:7.3f} ms/solve")

    # pscan backward variant
    pp = dataclasses.replace(p, backward_impl="pscan")

    def chain_pscan(k):
        def f(e, u):
            def body(i, carry):
                e_, u_ = carry
                r = solver.run_step(pp, plan, n, e_, u_, obstacles, unc)
                return (e_ + 1e-6 * r.X[1], r.U)
            return jax.lax.fori_loop(0, k, body, (e, u))
        return jax.jit(f)

    t_ps = slope_ms(chain_pscan)
    print(f"run_step (pscan)        : {t_ps:7.3f} ms/solve")

    # mega path at B=1 (padded to one 1024-lane tile in-kernel)
    def chain_mega(k):
        def f(e, u):
            def body(i, carry):
                e_, u_ = carry
                r = solver_batched.run_steps_batched(
                    p, plan, n, e_[None], u_[None], obstacles, unc,
                    impl="mega")
                return (e_ + 1e-6 * r.X[0, 1], r.U[0])
            return jax.lax.fori_loop(0, k, body, (e, u))
        return jax.jit(f)

    t_mega = slope_ms(chain_mega, k1=8, k2=168)
    print(f"mega @ B=1 (one tile)   : {t_mega:7.3f} ms/solve   "
          f"({t_ref / t_mega:.2f}x vs run_step)")

    # sanity: results agree at the parity bar
    r_ref = jax.jit(
        lambda e, u: solver.run_step(p, plan, n, e, u, obstacles, unc)
    )(egos[0], U0)
    r_meg = jax.jit(
        lambda e, u: solver_batched.run_steps_batched(
            p, plan, n, e[None], u[None], obstacles, unc, impl="mega")
    )(egos[0], U0)
    du = float(jnp.max(jnp.abs(r_ref.U - r_meg.U[0])))
    print(f"max |dU| run_step vs mega @B=1: {du:.2e}  "
          f"iters {int(r_ref.iterations)} vs {int(r_meg.iterations[0])}")


if __name__ == "__main__":
    main()
