"""Benchmark: batched uncertainty-aware CILQR solves/s on one TPU chip.

Headline metric (BASELINE.json): CILQR solves/s at N=50 horizon with full
barrier constraints (control bounds, elliptic obstacles, uncertainty-map
barrier), batched via vmap.  Baseline target: >= 1000 solves/s on a v5e-8;
``vs_baseline`` reports the ratio of this single-chip number to that full
8-chip target (>1.0 means one chip beats the whole-pod bar).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Env knobs: BENCH_BATCH (default 32768 — the axon tunnel's ~1 ms/dispatch
overhead is flat in B, so headline throughput wants wide batches; the
32k-scenario batch still solves in ~39 ms, inside the 0.1 s replanning
budget), BENCH_ITERS (default 10),
BENCH_PATH ("mega" (default) = fully-fused LM-iteration kernel
(ops/lm_pallas), "fused" = XLA derivatives + Pallas Riccati kernel,
"vmap" = reference vmap path), BENCH_MC / BENCH_FULL_STACK /
BENCH_CLOSED_LOOP (default 1 — the Monte-Carlo, full-pipeline and
closed-loop throughput extras are part of the default JSON line; set to 0
to skip for a quick headline-only run).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cilqr_tpu.sim.example_scenario import example_scenario as _scenario
    from cilqr_tpu.models import solver
    from cilqr_tpu.parallel import batch as pbatch
    from cilqr_tpu.utils.params import SolverParams

    B = int(os.environ.get("BENCH_BATCH", "32768"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    path = os.environ.get("BENCH_PATH", "mega")

    p = dataclasses.replace(SolverParams(), horizon=50)
    plan, n, ego, U0, obstacles, unc = _scenario(p, jnp.float32)

    rng = np.random.default_rng(2)
    egos = jnp.asarray(np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), jnp.float32)
    U0s = jnp.broadcast_to(U0, (B,) + U0.shape)

    if path in ("mega", "fused"):
        from cilqr_tpu.models import solver_batched

        impl = "mega" if path == "mega" else "two_phase"
        fn = jax.jit(
            lambda e, u: solver_batched.run_steps_batched(
                p, plan, n, e, u, obstacles, unc, impl=impl
            )
        )
    else:
        fn = jax.jit(
            lambda e, u: pbatch.batched_solve(p, plan, n, e, u, obstacles, unc)
        )

    # p99 end-to-end single-solve latency (dispatch + solve, warm cache).
    # Measured BEFORE the throughput phase: a freshly-drained compile queue
    # otherwise pollutes the tail.  Includes the remote-chip tunnel round
    # trip (~30 ms floor in this harness); co-located serving sees only the
    # device time.
    single = jax.jit(
        lambda e, u: solver.run_step(p, plan, n, e, u, obstacles, unc)
    )
    for i in range(25):  # warm: compile + settle the tunnel/dispatch path
        s_out = single(egos[i % B], U0s[0])
        jax.block_until_ready(s_out)
    lat = []
    for i in range(100):
        t1 = time.perf_counter()
        s_out = single(egos[i % B], U0s[0])
        jax.block_until_ready(s_out)
        lat.append(time.perf_counter() - t1)
    p99 = float(np.percentile(lat, 99))
    p50 = float(np.percentile(lat, 50))

    # DEVICE-TIME single-solve latency (tunnel-free): the end-to-end p99
    # above includes the ~30 ms axon RTT, so the 0.1 s-budget margin would
    # be inferred, not measured.  Chain k dependent solves inside ONE
    # dispatch (each iteration's ego/warm-start derives from the previous
    # result, so XLA cannot CSE or reorder them) and take the slope
    # (t(k2) - t(k1)) / (k2 - k1): per-solve device time with the dispatch
    # overhead cancelled exactly.
    def chain_slope_ms(pp):
        def make_chain(k):
            def f(e, u):
                def body(i, carry):
                    e_, u_ = carry
                    r = solver.run_step(pp, plan, n, e_, u_, obstacles, unc)
                    e2 = e_ + 1e-6 * r.X[1]  # data dependency between solves
                    return (e2, r.U)

                return jax.lax.fori_loop(0, k, body, (e, u))

            return jax.jit(f)

        k1, k2 = 4, 36
        c1, c2 = make_chain(k1), make_chain(k2)
        jax.block_until_ready(c1(egos[0], U0s[0]))
        jax.block_until_ready(c2(egos[0], U0s[0]))
        t1s, t2s = [], []
        for r in range(7):
            e_in = egos[r % B]
            t0 = time.perf_counter()
            jax.block_until_ready(c1(e_in, U0s[0]))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(c2(e_in, U0s[0]))
            t2s.append(time.perf_counter() - t0)
        return (float(np.median(t2s)) - float(np.median(t1s))) / (k2 - k1) * 1e3

    device_solve_ms = chain_slope_ms(p)
    # The SAME end-to-end methodology with backward_impl="pscan": the
    # associative-scan Riccati exists solely as a B=1 serving-latency play
    # (VERDICT r2 #3) — its backward-only microbench win (561 -> 385 us)
    # must survive the full solve (derivatives + forward included) to
    # justify itself.  Both numbers are in the JSON so the comparison is
    # recorded every round.
    device_solve_ms_pscan = chain_slope_ms(
        dataclasses.replace(p, backward_impl="pscan")
    )

    # batched throughput: pipelined dispatch with *varied* inputs per
    # iteration (the axon terminal dedups identical queued executions, which
    # silently turns a same-input timing loop into a no-op measurement)
    ego_batches = [
        jnp.asarray(
            np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), jnp.float32
        )
        for _ in range(iters)
    ]
    out = fn(ego_batches[0], U0s)
    jax.block_until_ready(out)

    # BENCH_TRACE=<dir>: capture a jax.profiler trace of the throughput
    # phase.  Inspect with xprof/tensorboard:
    #   tensorboard --logdir <dir>   (or xprof's trace_viewer on the
    #   .trace.json.gz under <dir>/plugins/profile/)
    trace_dir = os.environ.get("BENCH_TRACE")
    import contextlib

    tracer = (
        jax.profiler.trace(trace_dir) if trace_dir else contextlib.nullcontext()
    )
    with tracer:
        t0 = time.perf_counter()
        outs = [fn(e, U0s) for e in ego_batches]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
    solves_per_sec = B / dt
    out = outs[-1]

    # The MC / full-stack / closed-loop throughput metrics are ON by default
    # so every driver-captured BENCH_r*.json records them (VERDICT r1 #4);
    # set the env flag to 0 to skip (e.g. quick local runs).
    extras = {}
    if os.environ.get("BENCH_MC", "1") == "1":
        # Config-3 Monte-Carlo: per-scenario sampled covariance -> banded
        # Pallas costmap propagation -> hybrid mega solve (per-scenario
        # maps sampled by XLA each iteration).
        # Vehicle-frame map (lever arm <= ~32 m); sigma range matches the
        # reference's experiment magnitudes (Experiment.launch:7-12:
        # sigma_xy=0.16, sigma_theta=0.017), for which the default
        # 12-cell window covers every sampled 95% ellipse.
        from cilqr_tpu.ops import gridmap
        from cilqr_tpu.parallel import monte_carlo as mc_mod
        from cilqr_tpu.utils.params import CostmapParams

        from cilqr_tpu.ops import uncertainty_pallas

        cp = CostmapParams()
        sigma_hi = (0.16, 0.16, 0.017)
        center = (cp.x_position, cp.y_position)
        cp = mc_mod.ensure_window_covers(cp, cp.rows, cp.cols, center, sigma_hi)
        band_plan = uncertainty_pallas.make_band_plan(
            cp, cp.rows, cp.cols, center, sigma_hi
        )
        mc_prior = jnp.asarray(
            rng.uniform(0.0, 100.0, (cp.rows, cp.cols)), jnp.float32
        )
        mc_geom = gridmap.make_geom(
            center, cp.resolution, cp.rows, cp.cols, dtype=jnp.float32
        )
        Bmc = int(os.environ.get("BENCH_MC_BATCH", "8192"))
        base_ego = np.asarray(ego)
        mc_samples = [
            mc_mod.sample_scenarios(
                jax.random.key(k), Bmc, base_ego, sigma_hi=sigma_hi,
                dtype=jnp.float32,
            )
            for k in range(3)
        ]
        mc_fn = jax.jit(
            lambda sg, eg: mc_mod.monte_carlo(
                p, cp, mc_prior, mc_geom,
                jnp.asarray(base_ego[:2], jnp.float32),
                jnp.asarray(base_ego[3], jnp.float32),
                plan, n, mc_mod.MCSample(sg, eg), obstacles,
                sigma_hi=sigma_hi, impl="fast", band_plan=band_plan,
            )
        )
        o = mc_fn(mc_samples[0].sigmas, mc_samples[0].egos)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        os_ = [mc_fn(s.sigmas, s.egos) for s in mc_samples[1:]]
        jax.block_until_ready(os_)
        extras["mc_scenarios_per_sec"] = round(
            2 * Bmc / (time.perf_counter() - t0), 1
        )
        extras["mc_window_radius"] = cp.window_radius

    if os.environ.get("BENCH_FULL_STACK", "1") == "1":
        # The COMPLETE reference pipeline batched: per cycle, every scenario
        # rebuilds its own vehicle-frame uncertainty costmap (batched Pallas
        # propagation, per-scenario frames) and replans via the hybrid mega
        # solver.  The scaled replacement for N parallel CARLA+ROS stacks.
        from cilqr_tpu.ops import costmap as costmap_mod
        from cilqr_tpu.ops import gridmap, uncertainty_pallas
        from cilqr_tpu.sim import plant
        from cilqr_tpu.utils.params import CostmapParams, NoiseParams

        cpf = CostmapParams()
        # B=8192 is the measured throughput knee on one v5e chip (round 4:
        # 57.3k @ 4096, 60.7k @ 8192, 53.1k @ 16384 cycles/s — above the
        # knee the per-scenario costmap working set starts thrashing HBM)
        Bfs = int(os.environ.get("BENCH_FS_BATCH", "8192"))
        n_cyc = 5
        gmap = jnp.zeros((256, 256), jnp.float32)
        ggeom = gridmap.make_geom(
            [110.0, -300.0], 0.5, 256, 256, dtype=jnp.float32
        )
        x0s = jnp.asarray(
            np.asarray(ego)[None, :] + rng.normal(0, 0.3, (Bfs, 4)),
            jnp.float32,
        )
        # banded propagation sized for every corridor geometry this route
        # can produce (x/y margins cover the x0 scatter + tracking error)
        xr, yr = costmap_mod.corridor_center_bounds(cpf, plan, n)
        fs_band = uncertainty_pallas.make_band_plan_bounds(
            cpf, cpf.rows, cpf.cols, xr, yr,
            (cpf.sigma_x, cpf.sigma_y, cpf.sigma_theta),
        )
        fs = jax.jit(
            lambda x, k: plant.closed_loop_full_stack_batched(
                p, cpf, NoiseParams(), gmap, ggeom, plan, n, x, k, n_cyc,
                obstacles=obstacles, band_plan=fs_band, global_res=0.5,
            )
        )
        o = fs(x0s, jax.random.key(0))
        jax.block_until_ready(o)
        reps = 3  # median-of-reps: a single tunnel dispatch is too noisy
        times = []
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            o = fs(x0s + 1e-4 * r, jax.random.key(r))
            jax.block_until_ready(o)
            times.append(time.perf_counter() - t0)
        extras["full_stack_cycles_per_sec"] = round(
            n_cyc * Bfs / float(np.median(times)), 1
        )

    if os.environ.get("BENCH_CLOSED_LOOP", "1") == "1":
        from cilqr_tpu.sim import plant
        from cilqr_tpu.utils.params import NoiseParams

        n_cycles = 10
        cl = jax.jit(
            lambda x0s, k: plant.closed_loop_batched(
                p, NoiseParams(), plan, n, x0s, k, n_cycles,
                obstacles=obstacles, unc_map=unc,
            )
        )
        o = cl(ego_batches[0], jax.random.key(0))
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = cl(ego_batches[1], jax.random.key(1))
        jax.block_until_ready(o)
        extras["closed_loop_cycles_per_sec"] = round(
            n_cycles * B / (time.perf_counter() - t0), 1
        )

    mean_iters = float(jnp.mean(out.iterations.astype(jnp.float32)))

    # Speed-of-light accounting for the headline kernel (BASELINE north
    # star; full 3-kernel report: scripts/speed_of_light.py): analytic
    # FLOPs per LM iteration vs measured per-scenario-per-iteration device
    # time from the throughput phase above.
    from cilqr_tpu.utils import roofline

    sol = roofline.mega_iteration_cost(
        p, p.n_closest_samples, obstacles.pos.shape[0],
        -(-(unc.values.shape[0] * unc.values.shape[1]) // 128), has_unc=True,
    )
    per_scen_iter_s = dt / (B * max(mean_iters, 1.0))
    mega_pct_of_sol = round(100.0 * sol.t_sol / per_scen_iter_s, 1)

    print(
        json.dumps(
            {
                "metric": "cilqr_solves_per_sec_1chip_N50_full_constraints",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 1000.0, 3),
                "path": path,
                "batch": B,
                "batched_step_ms": round(dt * 1e3, 3),
                "p50_single_solve_ms": round(p50 * 1e3, 3),
                "p99_single_solve_ms": round(p99 * 1e3, 3),
                "p99_under_budget": p99 < 0.1,
                "device_single_solve_ms": round(device_solve_ms, 3),
                "device_single_solve_ms_pscan": round(device_solve_ms_pscan, 3),
                "mean_lm_iterations": round(mean_iters, 2),
                "mega_pct_of_sol": mega_pct_of_sol,
                "mega_sol_binding_resource": sol.bound,
                "device": str(jax.devices()[0]),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
