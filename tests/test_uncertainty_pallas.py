"""Pallas propagation kernel vs the pure-XLA reference (interpret mode)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.ops import costmap, gridmap, uncertainty_pallas
from cilqr_tpu.utils.params import CostmapParams


@pytest.mark.parametrize("yaw", [0.0, 2.1])
def test_pallas_kernel_matches_xla_reference(yaw):
    cp = dataclasses.replace(
        CostmapParams(), rows=24, cols=16, window_radius=6,
        sigma_x=0.05, sigma_y=0.05, sigma_theta=0.03,
    )
    rng = np.random.default_rng(21)
    prior = jnp.asarray(rng.uniform(0, 100, (cp.rows, cp.cols)), dtype=jnp.float32)
    geom = gridmap.make_geom([1.0, 0.5], cp.resolution, cp.rows, cp.cols, dtype=jnp.float32)

    want = costmap.propagate_uncertainty_reference(cp, prior, geom, jnp.asarray(yaw, jnp.float32))
    got = uncertainty_pallas.propagate_uncertainty_tpu(
        cp, prior, geom, jnp.asarray(yaw, jnp.float32), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4)


def test_batched_kernel_matches_vmapped_reference():
    """Per-scenario sigmas over one shared prior (the Monte-Carlo layout)."""
    cp = dataclasses.replace(CostmapParams(), rows=24, cols=20, window_radius=6)
    rng = np.random.default_rng(3)
    prior = jnp.asarray(rng.uniform(0, 100, (24, 20)), jnp.float32)
    geom = gridmap.make_geom([2.0, -1.0], cp.resolution, 24, 20, dtype=jnp.float32)
    yaw = jnp.asarray(0.7, jnp.float32)
    sigmas = jnp.asarray(rng.uniform(0.005, 0.05, (5, 3)), jnp.float32)

    import jax

    got = uncertainty_pallas.propagate_uncertainty_tpu_batched(
        cp, prior, geom, yaw, sigmas, interpret=True
    )
    want = jax.vmap(
        lambda sg: costmap.propagate_uncertainty_reference(
            cp, prior, geom, yaw, sigmas=(sg[0], sg[1], sg[2])
        )
    )(sigmas)
    assert got.shape == (5, 24, 20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4)
    # scenarios must actually differ (per-sigma fields reach the kernel)
    assert float(jnp.max(jnp.abs(got[0] - got[-1]))) > 1e-3


def test_banded_kernel_bit_identical_to_full_window():
    """Row bands with per-band radii from make_band_plan reproduce the
    fixed-window kernel exactly (coverage => w=0 beyond the ellipse)."""
    cp = dataclasses.replace(CostmapParams(), rows=40, cols=20, window_radius=12)
    rng = np.random.default_rng(5)
    prior = jnp.asarray(rng.uniform(0, 100, (40, 20)), jnp.float32)
    geom = gridmap.make_geom([4.0, 0.0], cp.resolution, 40, 20, dtype=jnp.float32)
    yaw = jnp.asarray(0.4, jnp.float32)
    sigma_hi = (0.16, 0.16, 0.017)
    sig_xy = rng.uniform(0.005, 0.16, (4, 2))
    sig_t = rng.uniform(0.005, 0.017, (4, 1))
    sigmas = jnp.asarray(np.concatenate([sig_xy, sig_t], axis=1), jnp.float32)

    plan = uncertainty_pallas.make_band_plan(cp, 40, 20, (4.0, 0.0), sigma_hi)
    assert plan.sigma_hi == sigma_hi
    assert len(plan.bands) >= 2
    assert all(r <= cp.window_radius for _, _, r in plan.bands)
    banded = uncertainty_pallas.propagate_uncertainty_tpu_banded(
        cp, prior, geom, yaw, sigmas, plan, interpret=True
    )
    full = uncertainty_pallas.propagate_uncertainty_tpu_batched(
        cp, prior, geom, yaw, sigmas, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(full))


def test_per_scenario_prior_and_frame_matches_reference():
    """Full-stack layout: every scenario has its own prior, geometry center,
    and yaw (sigmas from cp defaults)."""
    import jax

    cp = dataclasses.replace(CostmapParams(), rows=20, cols=16, window_radius=5)
    rng = np.random.default_rng(3)
    B = 3
    priors = jnp.asarray(rng.uniform(0, 100, (B, 20, 16)), jnp.float32)
    centers = jnp.asarray([[3.0, 0.0], [4.0, 0.5], [2.5, -0.5]], jnp.float32)
    geoms = jax.vmap(
        lambda c: gridmap.make_geom(c, cp.resolution, 20, 16, dtype=jnp.float32)
    )(centers)
    yaws = jnp.asarray([0.1, 0.5, -0.3], jnp.float32)

    plan = uncertainty_pallas.BandPlan(((0, 20, cp.window_radius),), None)
    got = uncertainty_pallas.propagate_uncertainty_tpu_banded(
        cp, priors, geoms, yaws, None, plan, interpret=True
    )
    want = jax.vmap(
        lambda pr, c, y: costmap.propagate_uncertainty_reference(
            cp, pr,
            gridmap.make_geom(c, cp.resolution, 20, 16, dtype=jnp.float32), y,
        )
    )(priors, centers, yaws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)
