"""Benchmark: batched uncertainty-aware CILQR solves/s on one TPU chip.

Headline metric (BASELINE.json): CILQR solves/s at N=50 horizon with full
barrier constraints (control bounds, elliptic obstacles, uncertainty-map
barrier), batched via vmap.  Baseline target: >= 1000 solves/s on a v5e-8;
``vs_baseline`` reports the ratio of this single-chip number to that full
8-chip target (>1.0 means one chip beats the whole-pod bar).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Every headline field carries dispersion (round 5): the throughput value is
the median of BENCH_PASSES (default 5) independent timed passes with
``value_spread`` = [min, max]; e2e latency is the median of 5 independent
sessions; the tunnel RTT is measured and reported separately; and the
0.1 s replanning budget is asserted against the device-time p99 (chained
solves), which tunnel noise cannot poison.

Env knobs: BENCH_BATCH (default 32768 — the axon tunnel's ~1 ms/dispatch
overhead is flat in B, so headline throughput wants wide batches; the
32k-scenario batch still solves in ~39 ms, inside the 0.1 s replanning
budget), BENCH_ITERS (default 10), BENCH_PASSES (default 5),
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


def slope_throughput(call, make_input, items, g1=1, g2=4, reps=3,
                     timer=None, blocker=None):
    """Pipelined-group slope throughput with a tunnel-stall guard.

    Per rep, time a pipelined group of ``g1`` dispatches and one of ``g2``
    (distinct inputs each — the axon terminal dedups identical queued
    executions) and take ``items * (g2 - g1) / (t2 - t1)``: the ~30 ms
    tunnel RTT appears once per group and cancels in the difference, so
    the recorded number is device throughput, not harness transport (a
    per-dispatch block_until_ready would overstate a ~100 ms dispatch by
    ~25%).

    Guard (round 5): a multi-second tunnel stall that straddles the whole
    phase makes BOTH group timings ~= the stall, so t2 - t1 -> ~0 and the
    slope explodes (observed once: closed loop "1.29e9 cycles/s", 800x
    reality, consistent across all reps — the min-of-2 spike filter cannot
    catch a stall longer than the phase).  The slope can legitimately
    exceed the blocking per-dispatch estimate ``items * g2 / t2`` (that
    includes one RTT), but not by much — any rep claiming > 3x that
    physical bound is rejected and re-measured (up to 3 attempts); if
    every attempt is rejected the conservative blocking estimate is
    reported instead of a poisoned slope.

    ``timer`` / ``blocker`` default to ``time.perf_counter`` /
    ``jax.block_until_ready`` and exist so the guard logic is unit-testable
    without a device (tests/test_utils.py).
    """
    if timer is None:
        timer = time.perf_counter
    if blocker is None:
        import jax

        blocker = jax.block_until_ready

    def time_group(tag, g):
        # min over 2 trials: the tunnel RTT is additive positive noise
        # with a heavy tail (p99 ~200 ms vs p50 ~30 ms measured), and one
        # spike on the small group makes the slope negative — min filters
        # spikes without biasing the device time underneath
        ts = []
        for trial in range(2):
            t0 = timer()
            outs = [
                call(make_input(10_000 * tag + 100 * trial + i))
                for i in range(g)
            ]
            blocker(outs)
            ts.append(timer() - t0)
        return min(ts)

    vals, bounds = [], []
    for r in range(reps):
        for attempt in range(3):
            tag = 2 * (r + reps * attempt)
            t1 = time_group(tag, g1)
            t2 = time_group(tag + 1, g2)
            val = items * (g2 - g1) / (t2 - t1)
            bound = items * g2 / t2
            bounds.append(bound)
            if 0 < val <= 3.0 * bound:
                vals.append(val)
                break
    if not vals:
        vals = [float(np.median(bounds))]
    return (
        round(float(np.median(vals)), 1),
        [round(float(np.min(vals)), 1), round(float(np.max(vals)), 1)],
    )


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache (same policy as the CLI/tests): the bench
    # only ever times warm executions, so caching compiles across driver
    # rounds changes nothing measured and cuts minutes of wall clock.
    from cilqr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

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

    # End-to-end single-solve latency (dispatch + solve, warm cache).
    # Measured BEFORE the throughput phase: a freshly-drained compile queue
    # otherwise pollutes the tail.  Includes the remote-chip tunnel round
    # trip (~30 ms floor in this harness); co-located serving sees only the
    # device time.
    #
    # METHODOLOGY (round 5 — BENCH_r04 shipped p99 138 ms from one noisy
    # tunnel session while device time stayed flat at 5.8 ms): a single
    # 100-sample pass has no defense against a bad tunnel session, so the
    # e2e numbers are now the MEDIAN OF K INDEPENDENT SESSIONS (k=5 x 60
    # dispatches, per-session p50/p99, spread reported), the tunnel RTT is
    # measured separately on a trivial dispatch and reported as its own
    # field, and the 0.1 s replanning budget (Parameters.cpp:11-12 implied
    # 10 Hz) is asserted against the DEVICE-time p99 from the chained-solve
    # distribution below — a number the tunnel cannot poison.
    single = jax.jit(
        lambda e, u: solver.run_step(p, plan, n, e, u, obstacles, unc)
    )
    for i in range(25):  # warm: compile + settle the tunnel/dispatch path
        s_out = single(egos[i % B], U0s[0])
        jax.block_until_ready(s_out)
    n_sessions, n_per = 5, 60
    sess_p50, sess_p99 = [], []
    for s in range(n_sessions):
        lat = []
        for i in range(n_per):
            t1 = time.perf_counter()
            s_out = single(egos[(s * n_per + i) % B], U0s[0])
            jax.block_until_ready(s_out)
            lat.append(time.perf_counter() - t1)
        sess_p50.append(float(np.percentile(lat, 50)))
        sess_p99.append(float(np.percentile(lat, 99)))
    p50 = float(np.median(sess_p50))
    p99 = float(np.median(sess_p99))
    p99_spread = (float(np.min(sess_p99)), float(np.max(sess_p99)))

    # Tunnel RTT on a trivial dispatch (an 8-float add): everything but the
    # solve.  Reported separately so an e2e tail regression can be
    # attributed to harness transport vs device work at a glance.
    tiny = jax.jit(lambda x: x + 1.0)
    tx = jnp.arange(8, dtype=jnp.float32)
    for _ in range(10):
        jax.block_until_ready(tiny(tx))
    rtts = []
    for i in range(60):
        t1 = time.perf_counter()
        jax.block_until_ready(tiny(tx + i))  # varied input: dedup trap
        rtts.append(time.perf_counter() - t1)
    rtt_p50 = float(np.percentile(rtts, 50))
    rtt_p99 = float(np.percentile(rtts, 99))

    # DEVICE-TIME single-solve latency (tunnel-free): the end-to-end p99
    # above includes the ~30 ms axon RTT, so the 0.1 s-budget margin would
    # be inferred, not measured.  Chain k dependent solves inside ONE
    # dispatch (each iteration's ego/warm-start derives from the previous
    # result, so XLA cannot CSE or reorder them) and take the slope
    # (t(k2) - t(k1)) / (k2 - k1): per-solve device time with the dispatch
    # overhead cancelled exactly.
    def chain_slope_ms(pp, reps=7, want_dist=False):
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
        t1s, t2s, slopes = [], [], []
        for r in range(reps):
            e_in = egos[r % B]  # varied input per rep (dedup trap, and the
            # per-rep slope distribution then samples data-dependent
            # convergence variation across start states)
            t0 = time.perf_counter()
            jax.block_until_ready(c1(e_in, U0s[0]))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(c2(e_in, U0s[0]))
            t2s.append(time.perf_counter() - t0)
            slopes.append((t2s[-1] - t1s[-1]) / (k2 - k1) * 1e3)
        med = (float(np.median(t2s)) - float(np.median(t1s))) / (k2 - k1) * 1e3
        if want_dist:
            # Per-rep slope p99: both chain timings in a rep share one
            # dispatch/RTT draw each, so the difference cancels the mean
            # overhead; the tail of this distribution is device-side (plus
            # residual RTT jitter, which only biases it CONSERVATIVELY
            # upward — safe for a budget assertion).
            return med, float(np.percentile(slopes, 99))
        return med

    device_solve_ms, device_solve_p99_ms = chain_slope_ms(
        p, reps=25, want_dist=True)
    # The SAME end-to-end methodology with backward_impl="pscan": the
    # associative-scan Riccati exists solely as a B=1 serving-latency play
    # (VERDICT r2 #3) — its backward-only microbench win (561 -> 385 us)
    # must survive the full solve (derivatives + forward included) to
    # justify itself.  Both numbers are in the JSON so the comparison is
    # recorded every round.
    device_solve_ms_pscan = chain_slope_ms(
        dataclasses.replace(p, backward_impl="pscan")
    )

    # SERVING fast path (round 5): the mega kernel at B=1.  run_steps_batched
    # pads a single scenario up to one 1024-lane tile whose padding lanes
    # replay lane 0, so the tile early-exits at the real lane's convergence
    # iteration — measured ~0.27 ms/solve vs ~5.7 ms on the unfused
    # run_step path (scripts/profile_serve_b1.py; 21x).  The chain must be
    # long (k2-k1 >> RTT_jitter/0.27ms) or the slope drowns in tunnel
    # noise — a first probe at k2-k1=16 measured a meaningless -0.025.
    from cilqr_tpu.models import solver_batched as _sb

    def make_mega_b1_chain(k):
        def f(e, u):
            def body(i, carry):
                e_, u_ = carry
                r = _sb.run_steps_batched(
                    p, plan, n, e_[None], u_[None], obstacles, unc,
                    impl="mega")
                return (e_ + 1e-6 * r.X[0, 1], r.U[0])

            return jax.lax.fori_loop(0, k, body, (e, u))

        return jax.jit(f)

    mk1, mk2 = 8, 88
    mc1, mc2 = make_mega_b1_chain(mk1), make_mega_b1_chain(mk2)
    jax.block_until_ready(mc1(egos[0], U0s[0]))
    jax.block_until_ready(mc2(egos[0], U0s[0]))
    mt1s, mt2s = [], []
    for r in range(9):
        e_in = egos[r % B]
        t0 = time.perf_counter()
        jax.block_until_ready(mc1(e_in, U0s[0]))
        mt1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(mc2(e_in, U0s[0]))
        mt2s.append(time.perf_counter() - t0)
    device_solve_ms_mega_b1 = (
        (float(np.median(mt2s)) - float(np.median(mt1s))) / (mk2 - mk1) * 1e3
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
    # Dispersion (round 5): the headline is the MEDIAN of k independent
    # timed passes (each `iters` pipelined dispatches), with min/max
    # reported, so cross-round drift is interpretable against the
    # within-session spread (the r1->r4 -4.5% "drift" was within the ~4%
    # same-session spread ROADMAP measured in round 4).  Inputs are
    # re-perturbed per pass — the axon terminal dedups identical queued
    # executions.
    k_passes = int(os.environ.get("BENCH_PASSES", "5"))
    dts = []
    with tracer:
        for pass_i in range(k_passes):
            ebs = (
                ego_batches
                if pass_i == 0
                else [e + 1e-5 * pass_i for e in ego_batches]
            )
            t0 = time.perf_counter()
            outs = [fn(e, U0s) for e in ebs]
            jax.block_until_ready(outs)
            dts.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(dts))
    solves_per_sec = B / dt
    solves_spread = (B / float(np.max(dts)), B / float(np.min(dts)))
    out = outs[-1]

    # The MC / full-stack / closed-loop throughput metrics are ON by default
    # so every driver-captured BENCH_r*.json records them (VERDICT r1 #4);
    # set the env flag to 0 to skip (e.g. quick local runs).
    #
    # All three use SLOPE-BASED throughput (round 5): see the module-level
    # ``slope_throughput`` for the method and its tunnel-stall guard.
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
        med, spread = slope_throughput(
            lambda a: mc_fn(a[0], a[1]),
            lambda i: (
                mc_samples[1 + i % 2].sigmas * (1.0 + 1e-7 * (i + 1)),
                mc_samples[1 + i % 2].egos,
            ),
            Bmc,
        )
        extras["mc_scenarios_per_sec"] = med
        extras["mc_scenarios_per_sec_spread"] = spread
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
        med, spread = slope_throughput(
            lambda a: fs(a[0], a[1]),
            lambda i: (x0s + 1e-5 * (i + 1), jax.random.key(i)),
            n_cyc * Bfs, g2=3,
        )
        extras["full_stack_cycles_per_sec"] = med
        extras["full_stack_cycles_per_sec_spread"] = spread

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
        med, spread = slope_throughput(
            lambda a: cl(a[0], a[1]),
            lambda i: (ego_batches[i % iters] + 1e-5 * (i + 1),
                       jax.random.key(i)),
            n_cycles * B, g2=3,
        )
        extras["closed_loop_cycles_per_sec"] = med
        extras["closed_loop_cycles_per_sec_spread"] = spread

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
                "value_spread": [
                    round(solves_spread[0], 1),
                    round(solves_spread[1], 1),
                ],
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 1000.0, 3),
                "path": path,
                "batch": B,
                "batched_step_ms": round(dt * 1e3, 3),
                # e2e = median of 5 independent 60-dispatch sessions over
                # the axon tunnel (includes ~rtt_p50 transport); the 0.1 s
                # replanning budget is asserted against the DEVICE p99
                # (chained-solve slope distribution), which the tunnel
                # cannot poison.  See the methodology comment in
                # cilqr_tpu/benchmark.py.
                "p50_single_solve_ms": round(p50 * 1e3, 3),
                "p99_single_solve_ms": round(p99 * 1e3, 3),
                "p99_session_spread_ms": [
                    round(p99_spread[0] * 1e3, 3),
                    round(p99_spread[1] * 1e3, 3),
                ],
                "tunnel_rtt_p50_ms": round(rtt_p50 * 1e3, 3),
                "tunnel_rtt_p99_ms": round(rtt_p99 * 1e3, 3),
                "device_p99_single_solve_ms": round(device_solve_p99_ms, 3),
                "p99_under_budget": device_solve_p99_ms < 100.0,
                "e2e_p99_under_budget": p99 < 0.1,
                "device_single_solve_ms": round(device_solve_ms, 3),
                "device_single_solve_ms_pscan": round(device_solve_ms_pscan, 3),
                "device_single_solve_ms_mega_b1": round(
                    device_solve_ms_mega_b1, 3),
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
