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
