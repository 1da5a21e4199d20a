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
