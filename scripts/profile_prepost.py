"""Decompose the mega path's FIXED per-solve overhead (round 5).

scripts/ilp_experiment.py's max_iterations sweep fits the headline step as
~12 ms fixed + ~0.93 ms/iteration at B=32k — the fixed part (~40% of the
production step) lives OUTSIDE the LM loop.  Per-stage timings use IN-JIT
CHAINED SLOPES (k1 vs k2 dependent repetitions inside one dispatch, slope
= per-op device time): standalone per-stage dispatches measured 3-5 ms of
tunnel overhead EACH and summed to 32 ms vs the 12 ms the step fit proves,
so dispatch-level stage timing is useless here (same lesson as
benchmark.py's device-latency methodology).

Usage: BENCH_BATCH=32768 PYTHONPATH=. python scripts/profile_prepost.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from cilqr_tpu.models import dynamics
    from cilqr_tpu.models.reference_path import get_local_plan
    from cilqr_tpu.ops import lm_pallas
    from cilqr_tpu.ops.riccati_pallas import _from_tiles, _to_tiles
    from cilqr_tpu.sim.example_scenario import example_scenario
    from cilqr_tpu.utils.params import SolverParams

    B = int(os.environ.get("BENCH_BATCH", "32768"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)
    U0s = jnp.broadcast_to(U0, (B,) + U0.shape)
    f32 = jnp.float32

    rng = np.random.default_rng(2)
    egos = jnp.asarray(
        np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), f32)

    def slope_ms(make_chain, x0, k1=2, k2=10, reps=5):
        c1, c2 = jax.jit(make_chain(k1)), jax.jit(make_chain(k2))
        jax.block_until_ready(c1(x0))
        jax.block_until_ready(c2(x0))
        t1s, t2s = [], []
        for r in range(reps):
            xr = jax.tree.map(lambda a: a + 1e-7 * (r + 1), x0)
            t0 = time.perf_counter()
            jax.block_until_ready(c1(xr))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(c2(xr))
            t2s.append(time.perf_counter() - t0)
        return (float(np.median(t2s)) - float(np.median(t1s))) / (k2 - k1) * 1e3

    # plan fit: e -> LocalPlan, feed 4 coeffs back into e
    def fit_chain(k):
        def f(e):
            def body(i, e_):
                pl_ = jax.vmap(lambda e1: get_local_plan(p, plan, n, e1))(e_)
                return e_ + 1e-9 * pl_.coeffs[:, :4]
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_fit = slope_ms(fit_chain, egos)
    print(f"plan fit          : {t_fit:7.2f} ms")

    # rollout: e -> X, feed X[:, 1] back
    def roll_chain(k):
        def f(e):
            def body(i, e_):
                X = jax.vmap(lambda e1, u: dynamics.rollout(p, e1, u))(e_, U0s)
                return e_ + 1e-9 * X[:, 1]
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_roll = slope_ms(roll_chain, egos)
    print(f"rollout           : {t_roll:7.2f} ms")

    # tile round trip: X -> tiles -> X
    X0 = jax.jit(
        lambda e: jax.vmap(lambda e1, u: dynamics.rollout(p, e1, u))(e, U0s)
    )(egos)

    def tiles_chain(k):
        def f(X):
            def body(i, X_):
                Xt = _to_tiles(X_.astype(f32), B)
                return X_ + 1e-9 * _from_tiles(Xt, B, (4,))
            return jax.lax.fori_loop(0, k, body, X)
        return f

    t_tiles = slope_ms(tiles_chain, X0)
    print(f"to+from tiles (X) : {t_tiles:7.2f} ms")

    # kernel at 0 LM iterations: staging + in-kernel sample-table regen +
    # X/U copy-in/out, no iteration body
    plans0 = jax.jit(
        lambda e: jax.vmap(lambda e1: get_local_plan(p, plan, n, e1))(e)
    )(egos)
    fit_t = jax.jit(
        lambda pl_: _to_tiles(lm_pallas._fit_payload(pl_)[:, :, None], B)
    )(plans0)
    U_t = jax.jit(lambda u: _to_tiles(u.astype(f32), B))(U0s)
    X_t = jax.jit(lambda X: _to_tiles(X.astype(f32), B))(X0)
    world = lm_pallas.prep_world(p, obstacles, unc, f32)
    p0 = dataclasses.replace(p, max_iterations=0)

    def k0_chain(k):
        def f(Xt):
            def body(i, Xt_):
                out = lm_pallas._fused_optimize_call(
                    p0, world, fit_t, Xt_, U_t, interpret=False)
                return Xt_ + 1e-9 * out[0]
            return jax.lax.fori_loop(0, k, body, Xt)
        return f

    t_k0 = slope_ms(k0_chain, X_t)
    print(f"kernel @0 iters   : {t_k0:7.2f} ms   (staging + sample-table "
          f"regen + X/U copy in/out)")

    total = t_fit + t_roll + t_tiles + t_k0
    print(f"sum (chained)     : {total:7.2f} ms  vs ~12.1 ms fitted fixed "
          f"(U tiling / J detile / SolveResult glue not chained here)")

    # ---- sub-decompose the plan fit (cumulative chains) ----
    from cilqr_tpu.models import reference_path as rp

    def cpi_chain(k):  # closest_point_index only
        def f(e):
            def body(i, e_):
                idx = jax.vmap(
                    lambda e1: rp.closest_point_index(plan, n, e1))(e_)
                return e_ + 1e-9 * idx[:, None].astype(f32)
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_cpi = slope_ms(cpi_chain, egos)
    print(f"  fit: closest idx: {t_cpi:7.2f} ms")

    W = p.num_of_local_wpts
    P = plan.shape[0]
    plan_ext = jnp.concatenate(
        [plan, jnp.broadcast_to(plan[-1], (W, 2))], axis=0)
    win_idx = jnp.arange(P)[:, None] + jnp.arange(W)[None, :]
    windows = plan_ext[win_idx].reshape(P, 2 * W)

    def winfetch_chain(k):  # + one-hot window fetch
        def f(e):
            def body(i, e_):
                idx = jax.vmap(
                    lambda e1: rp.closest_point_index(plan, n, e1))(e_)
                oh = jax.nn.one_hot(idx, P, dtype=f32)
                w = jnp.matmul(oh, windows,
                               precision=jax.lax.Precision.HIGHEST)
                return e_ + 1e-9 * w[:, :4]
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_wf = slope_ms(winfetch_chain, egos)
    print(f"  fit: + window   : {t_wf:7.2f} ms")

    def polyfit_chain(k):  # + the polyfit on fetched windows
        def f(e):
            def body(i, e_):
                idx = jax.vmap(
                    lambda e1: rp.closest_point_index(plan, n, e1))(e_)
                oh = jax.nn.one_hot(idx, P, dtype=f32)
                w = jnp.matmul(oh, windows,
                               precision=jax.lax.Precision.HIGHEST)
                wr = w.reshape(-1, W, 2)
                co, _, _ = jax.vmap(
                    lambda xy: rp.polyfit_scaled(
                        xy[:, 0], xy[:, 1], p.poly_order))(wr)
                return e_ + 1e-9 * co[:, :4]
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_pf = slope_ms(polyfit_chain, egos)
    print(f"  fit: + polyfit  : {t_pf:7.2f} ms")

    # ---- full-path fixed cost, directly (run_steps_batched @ 0 iters) ----
    from cilqr_tpu.models import solver_batched

    p0f = dataclasses.replace(p, max_iterations=0)

    def full0_chain(k):
        def f(e):
            def body(i, e_):
                out = solver_batched.run_steps_batched(
                    p0f, plan, n, e_, U0s, obstacles, unc, impl="mega")
                return e_ + 1e-9 * out.X[:, 1]
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_full0 = slope_ms(full0_chain, egos, k1=2, k2=6)
    print(f"full path @0 iters: {t_full0:7.2f} ms  (the fixed cost, "
          f"measured directly in one jit; unused outputs DCE'd)")

    # Same chain but with EVERY SolveResult output forced live — the E2
    # fixed-cost fit keeps all outputs, so the gap between this and the
    # DCE'd chain is the detile/glue cost of the outputs themselves.
    def full0_all_chain(k):
        def f(e):
            def body(i, e_):
                out = solver_batched.run_steps_batched(
                    p0f, plan, n, e_, U0s, obstacles, unc, impl="mega")
                probe = jnp.stack(
                    [
                        out.J,
                        out.lamb,
                        out.iterations.astype(f32),
                        out.U[:, 0, 0]
                        + out.ref_x[:, 0]
                        + out.ref_y[:, 0],
                    ],
                    axis=-1,
                )
                return e_ + 1e-9 * out.X[:, 1] + 1e-12 * probe
            return jax.lax.fori_loop(0, k, body, e)
        return f

    t_full0a = slope_ms(full0_all_chain, egos, k1=2, k2=6)
    print(f"full path @0 iters (all outputs live): {t_full0a:7.2f} ms")


if __name__ == "__main__":
    main()
