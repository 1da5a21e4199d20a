"""Chip-tier bit-identity checks, COMPILED on the real TPU.

Interpret-mode coverage (tests/test_uncertainty_pallas.py, test_costmap.py)
is bit-exact but CPU-only by design — it cannot catch Mosaic lowering
regressions.  These tests promote the manual checks that lived in
scripts/drive_e2e.py (advisor r3 / VERDICT r4 #6) to an unskippable pytest
tier:

    CILQR_TPU_TEST_TPU=1 python -m pytest tests/ -m tpu -q

The conftest keeps the real platform in that mode (no cpu forcing, no
f64) and auto-skips everything else; without the env var these tests are
auto-skipped, so the default CPU tiers are unaffected.

Reference anchors: the propagation loop these kernels re-implement is
/root/reference/CILQR/src/map_engine/src/arbitrary_transformation.cu:102-151.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("CILQR_TPU_TEST_TPU") == "1":
    import jax
    import jax.numpy as jnp

    _plat = jax.devices()[0].platform.lower()
    if _plat not in ("axon", "tpu"):
        pytest.skip(
            f"chip tier needs a real TPU (got platform {_plat!r})",
            allow_module_level=True,
        )
else:
    pytest.skip(
        "chip tier: set CILQR_TPU_TEST_TPU=1 and run -m tpu",
        allow_module_level=True,
    )

from cilqr_tpu.ops import costmap, gridmap, sample_pallas, uncertainty_pallas
from cilqr_tpu.utils.params import CostmapParams

f32 = jnp.float32


def test_aligned_row_loop_matches_unroll_on_chip():
    """Aligned-group dynamic-row propagation (Mosaic pl.multiple_of dynamic
    sublane starts on rank-3 refs) vs the static unroll, compiled on the
    real chip, bit-identical.  The aligned mode is the only form that
    compiles at the high-sigma production windows (ROADMAP r3); this locks
    its Mosaic lowering against the serving fast path."""
    cp = CostmapParams()
    B = 64
    geom = gridmap.make_geom(
        (cp.x_position, cp.y_position), cp.resolution, cp.rows, cp.cols,
        dtype=f32)
    geomB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), geom)
    pri = jnp.asarray(
        np.random.default_rng(7).uniform(0, 100, (B, cp.rows, cp.cols)), f32)
    yaws = jnp.linspace(-3.0, 3.0, B).astype(f32)
    sig = jnp.broadcast_to(jnp.asarray([0.16, 0.16, 0.017], f32), (B, 3))
    bp = uncertainty_pallas.make_band_plan(
        cp, cp.rows, cp.cols, (cp.x_position, cp.y_position),
        (0.16, 0.16, 0.017))
    out_unroll = jax.jit(
        lambda pr: uncertainty_pallas.propagate_uncertainty_tpu_banded(
            cp, pr, geomB, yaws, sig, bp, unroll_rows=True))(pri)
    out_align = jax.jit(
        lambda pr: uncertainty_pallas.propagate_uncertainty_tpu_banded(
            cp, pr, geomB, yaws, sig, bp, unroll_rows="aligned"))(pri)
    np.testing.assert_array_equal(np.asarray(out_unroll),
                                  np.asarray(out_align))


def test_shear_resample_matches_xla_on_chip():
    """Shear-decomposition prior-resample kernel vs the XLA vmapped
    sample_prior, compiled on the real chip, bit-identical — across yaw
    quadrants (incl. the eps-critical cos<0 / sin<0 angles) and
    border/off-map poses that take the in-kernel window fallback."""
    rows, cols, res_v, res_g = 64, 56, 0.2, 0.5
    H, W = 136, 132
    rng = np.random.default_rng(7)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), f32)
    ggeom = gridmap.make_geom([50.0, -80.0], res_g, H, W, dtype=f32)
    assert sample_pallas.supports_shear(rows, cols, res_v, res_g, H, W)

    yaw_list = [0.0, np.pi / 4, np.pi / 2, np.pi, -np.pi / 2, -3.0, 2.2,
                -0.3]
    pose_list = [(50.0, -80.0), (62.0, -74.0), (78.0, -80.0),
                 (50.0, -104.0), (120.0, -80.0), (50.0, -200.0)]
    ex = np.asarray([x for x, _ in pose_list for _y in yaw_list])
    ey = np.asarray([y for _, y in pose_list for _y in yaw_list])
    yw = np.asarray([y_ for _ in pose_list for y_ in yaw_list])
    B = len(ex)
    egos = jnp.asarray(np.stack([ex, ey], -1), f32)
    yaws = jnp.asarray(yw, f32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 10, B), rng.uniform(-3, 3, B)], -1), f32)
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=f32))(centers)

    got = jax.jit(
        lambda e, y: sample_pallas.sample_prior_batched_tpu(
            geoms, rows, cols, res_v, res_g, gmap, ggeom, e, y,
            algo="shear"))(egos, yaws)
    want = jax.jit(jax.vmap(
        lambda g, e, y: costmap.sample_prior(
            g, rows, cols, gmap, ggeom, e, y)))(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_window_resample_matches_xla_on_chip():
    """Direct window-gather resample kernel (the non-shear fallback for
    maps too large for the shear copy) vs XLA, compiled, bit-identical."""
    rows, cols, res_v, res_g = 48, 40, 0.2, 0.5
    H, W = 96, 88
    rng = np.random.default_rng(4)
    gmap = jnp.asarray(rng.uniform(0, 100, (H, W)), f32)
    ggeom = gridmap.make_geom([110.0, -300.0], res_g, H, W, dtype=f32)
    B = 8
    egos = jnp.asarray(
        np.stack([rng.uniform(100, 120, B), rng.uniform(-310, -290, B)], -1),
        f32)
    yaws = jnp.asarray(rng.uniform(-3.2, 3.2, B), f32)
    centers = jnp.asarray(
        np.stack([rng.uniform(-2, 10, B), rng.uniform(-3, 3, B)], -1), f32)
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, res_v, rows, cols, dtype=f32))(centers)
    assert sample_pallas.supports(rows, cols, res_v, res_g, H, W)
    got = jax.jit(
        lambda e, y: sample_pallas.sample_prior_batched_tpu(
            geoms, rows, cols, res_v, res_g, gmap, ggeom, e, y,
            algo="window"))(egos, yaws)
    want = jax.jit(jax.vmap(
        lambda g, e, y: costmap.sample_prior(
            g, rows, cols, gmap, ggeom, e, y)))(geoms, egos, yaws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mega_kernel_matches_unfused_path_on_chip():
    """The flagship fused LM-iteration kernel (ops/lm_pallas), COMPILED on
    the real chip, vs the unfused run_step path at full production params
    (N=50, obstacles + uncertainty barrier).

    The CPU tier cross-checks the mega kernel only in Pallas interpret
    mode (tests/test_lm_pallas.py) — a Mosaic lowering regression would
    sail through it.  This locks the compiled kernel end-to-end: identical
    convergence decisions, matching objective, matching APPLIED controls.
    Tolerance note (measured on chip on this exact scenario set): the two
    paths reduce costs in different f32 orders and per-iteration diffs
    amplify along the 50-step horizon — iterations match EXACTLY on all
    lanes, rel |dJ| <= 0.71%, |dU| over the first 10 steps <= 3.4e-3, but
    the horizon TAIL of 3/16 lanes drifts up to 0.149 (receding-horizon
    MPC only ever applies the head; the tail is replanned next cycle, so
    the head is what the framework guarantees across paths).  Bars: head
    controls/states 1e-2, J 2e-2 rel, full-horizon garbage cap 0.5 — any
    lowering bug (wrong tile addressing, garbage lanes) fails all of them
    by orders of magnitude.

    Covers B=16 (padded tile, the throughput shape) and B=1 (the serving
    fast path bench.py reports as device_single_solve_ms_mega_b1).

    Reference anchor: the LM loop both paths implement is
    /root/reference/CILQR/src/ilqr/include/ilqr/iLQR.cpp:211-239.
    """
    import dataclasses

    from cilqr_tpu.models import solver, solver_batched
    from cilqr_tpu.sim.example_scenario import example_scenario
    from cilqr_tpu.utils.params import SolverParams

    p = dataclasses.replace(SolverParams(), horizon=50)
    plan, n, ego, U0, obstacles, unc = example_scenario(p, jnp.float32)
    rng = np.random.default_rng(11)
    B = 16
    egos = jnp.asarray(
        np.asarray(ego)[None, :] + rng.normal(0, 0.3, (B, 4)), f32)
    U0s = jnp.broadcast_to(U0, (B,) + U0.shape)

    got = jax.jit(
        lambda e, u: solver_batched.run_steps_batched(
            p, plan, n, e, u, obstacles, unc, impl="mega"))(egos, U0s)
    want = jax.jit(jax.vmap(
        lambda e, u: solver.run_step(p, plan, n, e, u, obstacles, unc)))(
        egos, U0s)

    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(want.iterations))
    np.testing.assert_allclose(
        np.asarray(got.U[:, :10]), np.asarray(want.U[:, :10]),
        rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(got.X[:, :10]), np.asarray(want.X[:, :10]),
        rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(got.J), np.asarray(want.J), rtol=2e-2)
    assert float(np.max(np.abs(np.asarray(got.U) - np.asarray(want.U)))) \
        < 0.5  # full-horizon garbage cap

    # serving shape: B=1 pads to one tile whose padding lanes replay lane 0
    got1 = jax.jit(
        lambda e, u: solver_batched.run_steps_batched(
            p, plan, n, e[None], u[None], obstacles, unc, impl="mega"))(
        egos[0], U0)
    np.testing.assert_allclose(
        np.asarray(got1.U[0]), np.asarray(got.U[0]), rtol=1e-6, atol=1e-6)
