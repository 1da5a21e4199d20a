"""B=1 single-solve latency: sequential Riccati backward vs associative-scan.

Measures on the current JAX platform (run with the default axon/TPU env for
real numbers; ~30 ms of every wall-clock call is tunnel RTT, so the solve
comparison below reports *relative* wall numbers plus backward-only timings
where the RTT cancels in the difference).

    PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_pscan.py
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from _benchutil import timeit_varied  # noqa: E402

from cilqr_tpu.models import costs as costs_mod, dynamics, obstacles as obs_mod
from cilqr_tpu.models import reference_path as rp, solver
from cilqr_tpu.ops import riccati_pscan
from cilqr_tpu.utils.params import SolverParams


def main(n_iters=32):
    dtype = jnp.float32
    print("platform:", jax.devices()[0].platform)
    for N in (40, 50):
        p = dataclasses.replace(SolverParams(), horizon=N)
        p_ps = dataclasses.replace(p, backward_impl="pscan")

        rng = np.random.default_rng(0)
        s = np.linspace(0.0, 119.0, 120)
        plan_np = np.stack([90.0 + s, -306.0 + 2.5 * np.sin(0.03 * s)], 1)
        plan_xy, n = rp.pad_global_plan(p, plan_np, dtype=dtype)
        ob = obs_mod.make_static_obstacles(
            p, np.array([[112.0, -304.0]]), np.array([[4.5, 2.0]]),
            np.array([0.1]), dtype=dtype)
        egos = [
            jnp.asarray([100.0, -305.6, 4.0, 0.05], dtype)
            + jnp.asarray(rng.normal(0, 0.2, 4), dtype)
            for _ in range(n_iters + 1)
        ]
        U0 = solver.initial_controls(p, dtype=dtype)

        # ---- backward pass alone (derivs precomputed) ----
        plan = rp.get_local_plan(p, plan_xy, n, egos[0])
        X0 = dynamics.rollout(p, egos[0], U0)
        d = costs_mod.all_cost_derivs(p, plan, X0, U0, ob, None)
        lam = jnp.asarray(1.0, dtype)
        ds = [jax.tree.map(lambda a: a + 1e-6 * i, d) for i in range(n_iters + 1)]

        seq = jax.jit(lambda dd: solver.backward_from_derivs(p, dd, X0, U0, lam))
        ps = jax.jit(lambda dd: riccati_pscan.backward_pscan(p, dd, X0, U0, lam))
        t_seq, _ = timeit_varied(seq, [(x,) for x in ds])
        t_ps, _ = timeit_varied(ps, [(x,) for x in ds])
        print(f"N={N} backward-only: seq {1e3 * t_seq:.3f} ms  "
              f"pscan {1e3 * t_ps:.3f} ms  speedup {t_seq / t_ps:.2f}x  "
              "(dispatch-bound wall)")

        # device time: 64 dependent backward applications inside ONE jit —
        # dispatch/tunnel overhead amortizes away, each iteration's input
        # depends on the previous output so nothing can be CSE'd or deduped.
        # N=50 only: each chained program costs minutes of (remote) compile
        if N != 50:
            continue
        REP = 64

        def chain(back):
            def f(dd):
                def body(i, acc):
                    dd_i = jax.tree.map(
                        lambda a: a + 1e-12 * acc[0].sum() + 1e-12 * i, dd)
                    return back(p, dd_i, X0, U0, lam)
                return jax.lax.fori_loop(0, REP, body, back(p, dd, X0, U0, lam))
            return jax.jit(f)

        c_seq = chain(solver.backward_from_derivs)
        c_ps = chain(riccati_pscan.backward_pscan)
        t_seq, _ = timeit_varied(c_seq, [(x,) for x in ds[:9]])
        t_ps, _ = timeit_varied(c_ps, [(x,) for x in ds[:9]])
        print(f"N={N} backward device: seq {1e6 * t_seq / REP:.1f} us  "
              f"pscan {1e6 * t_ps / REP:.1f} us  speedup {t_seq / t_ps:.2f}x")

        # ---- full single solve ----
        f_seq = jax.jit(lambda e: solver.run_step(p, plan_xy, n, e, U0, ob, None))
        f_ps = jax.jit(lambda e: solver.run_step(p_ps, plan_xy, n, e, U0, ob, None))
        t_seq, r1 = timeit_varied(f_seq, [(e,) for e in egos])
        t_ps, r2 = timeit_varied(f_ps, [(e,) for e in egos])
        print(f"N={N} full solve:    seq {1e3 * t_seq:.3f} ms  "
              f"pscan {1e3 * t_ps:.3f} ms  "
              f"(iters {int(r1.iterations)}/{int(r2.iterations)}, "
              f"J {float(r1.J):.3f}/{float(r2.J):.3f})")


if __name__ == "__main__":
    main()
