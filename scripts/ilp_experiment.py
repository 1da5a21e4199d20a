"""The interleaved-tile ILP experiment, done as controlled A/Bs (VERDICT r4 #3).

The mega kernel sits at ~20% of measured speed-of-light with dependency
latency (ALU-port fill) as the binding resource; ROADMAP's scoped lever is
"two scenario tiles interleaved per kernel instance with SEPARATE
accept/reject convergence masks".  Before building that (4x kernel-body
module, doubled VMEM), this script separates the two hypotheses that the
round-4 tile-widening regression (TS=16: -13%) confounded:

  (a) EXIT GRANULARITY: a widened tile runs every iteration its slowest
      lane needs, and the tile-max grows with width.  Separate sub-tile
      masks can recover exactly the gap between pair-max and per-tile-max
      iteration counts — so measure that gap from the real per-lane
      iteration data (E1).  If tile-max(2048) - tile-max(1024) is small,
      there is nothing for separate masks to recover.

  (b) LAYOUT/VMEM: each (16, 128) plane op is already TWO adjacent
      independent (8, 128) register ops — exactly the interleaved ILP the
      pair kernel would produce — so if TS=16 still loses with the
      convergence confound REMOVED (every lane forced to run exactly
      max_iterations: tolerance < 0 so accept never stops, lamb_max huge
      so reject never stops), the regression is layout/VMEM pressure and
      no accept/reject restructuring can save it (E2).

Usage:  python scripts/ilp_experiment.py            # E1 + TS=8 fixed-iter leg
        CILQR_TPU_TILE_SUBLANES=16 python scripts/ilp_experiment.py --e2-only
(TS is latched at import, so the two E2 legs are separate processes.)
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

    from _benchutil import timeit_varied

    from cilqr_tpu.models import solver_batched
    from cilqr_tpu.ops.riccati_pallas import TILE, _TS
    from cilqr_tpu.sim.example_scenario import example_scenario
    from cilqr_tpu.utils.params import SolverParams

    e2_only = "--e2-only" in sys.argv
    B = int(os.environ.get("BENCH_BATCH", "32768"))
    p = dataclasses.replace(SolverParams(), horizon=50)
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)
    rng = np.random.default_rng(2)
    U0s = jnp.broadcast_to(U0, (B,) + U0.shape)

    def egos_of(k):
        r = np.random.default_rng(k)
        return jnp.asarray(
            np.asarray(ego)[None, :] + r.normal(0, 0.3, (B, 4)), jnp.float32)

    print(f"TILE_SUBLANES={_TS}  TILE={TILE}  B={B}")

    if not e2_only:
        # ---- E1: per-tile iteration maxima at 1024 vs 2048 lanes ----
        fn = jax.jit(lambda e, u: solver_batched.run_steps_batched(
            p, plan, n, e, u, obstacles, unc, impl="mega"))
        out = fn(egos_of(2), U0s)
        it = np.asarray(out.iterations).astype(np.int64)
        t1024 = it.reshape(-1, 1024).max(axis=1)
        t2048 = it.reshape(-1, 2048).max(axis=1)
        pair_gap = t2048.repeat(2) - t1024  # extra iters a merged pair runs
        print(f"E1: lane iterations mean={it.mean():.2f} p50={np.median(it):.0f} "
              f"max={it.max()}")
        print(f"E1: tile-max @1024 mean={t1024.mean():.2f} (min {t1024.min()} "
              f"max {t1024.max()})")
        print(f"E1: tile-max @2048 mean={t2048.mean():.2f}")
        print(f"E1: mean extra iters a 2048-merge costs a 1024-tile: "
              f"{pair_gap.mean():.3f} "
              f"({100.0 * pair_gap.mean() / t1024.mean():.1f}% of tile work) "
              f"<- the MOST separate convergence masks could recover")

    # ---- E2: fixed-iteration A/B (convergence disabled) ----
    # tolerance < 0: |J_new - J_old| < tol never true -> accept never stops;
    # lamb_max huge: reject never stops; every lane runs max_iterations.
    # Sweeping max_iterations fits step = fixed + iters * slope, separating
    # the XLA pre/post region (plan fit, rollout, tile transposes) from the
    # in-kernel LM loop.
    results = []
    for mi in (0, 2, 5, 10, 20):
        p_fix = dataclasses.replace(p, tolerance=-1.0, lamb_max=1e30,
                                    max_iterations=mi)
        fnf = jax.jit(lambda e, u, pf=p_fix: solver_batched.run_steps_batched(
            pf, plan, n, e, u, obstacles, unc, impl="mega"))
        variants = [(egos_of(10 + k), U0s) for k in range(6)]
        t0 = time.perf_counter()
        fnf.lower(*variants[0]).compile()
        tc = time.perf_counter() - t0
        t, out = timeit_varied(fnf, variants)
        it = np.asarray(out.iterations)
        assert (it == mi).all(), it
        results.append((mi, t))
        print(f"E2 (TS={_TS}): fixed {mi:2d} iters  step={1e3 * t:.2f} ms  "
              f"solves/s={B / t:,.0f}  (compile {tc:.0f}s)")
    (m1, t1), (m2, t2) = results[0], results[-1]
    slope = (t2 - t1) / (m2 - m1)
    fixed = t1 - m1 * slope
    print(f"E2 (TS={_TS}): linear fit -> fixed={1e3 * fixed:.2f} ms "
          f"+ {1e3 * slope:.3f} ms/iteration "
          f"(kernel loop = {100.0 * (1.0 - fixed / t2):.0f}% of the "
          f"{m2}-iteration step)")


if __name__ == "__main__":
    main()
