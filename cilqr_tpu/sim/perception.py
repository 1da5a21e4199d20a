"""Simulated perception bbox camera — the sensor feeding the KF tracker.

The reference's perception channel is a camera/detector publishing pixel
bounding boxes on ``bounding_box`` (``std_msgs::UInt8MultiArray`` xyxy in a
150x100 image plane) consumed by ``LocalCostmap::bboxCallback``
(``CILQR/src/map_engine/src/local_costmap.cpp:328-394``): the message is
sanity-gated (out-of-plane readings reset the track and clear the layer,
:331-336), converted xyxy -> [cx, cy, w, h] (:343-349), smoothed by the
constant-velocity Kalman filter (:352-380 — see ``models/tracker.py``), and
rasterized into the ``semantic_lidar_map`` layer via a SubmapIterator whose
start index is ``(150 - cy - h/2, 50 + cx - w/2)`` (:358-362).

This module closes the loop without CARLA: it projects a (moving) obstacle's
ground-truth OBB into the vehicle-frame grid and emits the [cx, cy, w, h]
cell-unit measurement in the reference's camera convention — the *exact
inverse* of ``ops.costmap.rasterize_tracked_bbox``'s start-index mapping, so
a noiseless measurement rasterizes precisely back onto the obstacle's cells.
Gaussian pixel noise models the detector; the validity gate mirrors the
reference's out-of-plane check.

Reference quirk (documented, not reproduced): ``bboxCallback`` paints the
submap using ``measurement`` *before* writing the new reading into it
(:358-371 vs :374-377), i.e. the painted box is the previous cycle's raw
measurement and the KF posterior (``statePost``) is never consulted for
painting.  Here the painted box is the KF-smoothed posterior — the obvious
intent of wiring a tracker at all (the closed-loop test locks that the
*tracked* box, not the raw measurement or ground truth, shapes the costmap).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cilqr_tpu.ops import gridmap
from cilqr_tpu.utils.params import CostmapParams


class PerceptionSim(NamedTuple):
    """Config for the simulated camera channel in the full-stack loop.

    ``obs_index`` (Python int, trace-static): which obstacle row the camera
    sees.  That obstacle is *removed* from the bounding-box rasterization
    channel — its only path into the costmap is camera -> KF ->
    ``semantic_lidar_map`` (the reference's two independent sensor channels,
    local_costmap.cpp:860-922 vs :328-394) — while the SAT collision ground
    truth still sees its true pose.
    """

    obs_index: int
    vel: jax.Array      # (2,) constant global-frame velocity [m/s]
    bbox_sigma: float   # detector noise, cells (std dev on cx/cy/w/h)


def bbox_measurement(
    cp: CostmapParams,
    geom: gridmap.GridGeom,
    ego_xy: jax.Array,
    ego_yaw: jax.Array,
    obs_xy: jax.Array,
    obs_size: jax.Array,
    obs_yaw: jax.Array,
    key=None,
    sigma: float = 0.0,
):
    """Project one obstacle OBB to a noisy [cx, cy, w, h] cell measurement.

    Returns ``(z (4,), valid ())``.  ``z`` follows the reference camera
    convention (local_costmap.cpp:343-349): ``rasterize_tracked_bbox`` maps
    it to the row span ``[150 - cy - h/2, +h)`` and column span
    ``[50 + cx - w/2, +w)``, so here ``cy = 150 - r0 - h/2`` and
    ``cx = c0 - 50 + w/2`` with (r0, c0) the top-left continuous index of the
    obstacle's axis-aligned cell bbox — the constants cancel and the painted
    cells land on the obstacle.  ``valid`` mirrors the out-of-plane gate
    (:331-336): the noisy box must lie fully inside the grid with positive
    extent.
    """
    dtype = geom.center.dtype
    half = 0.5 * obs_size
    signs = jnp.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]], dtype
    )
    corners = signs * half  # (4, 2) obstacle frame
    co, so = jnp.cos(obs_yaw), jnp.sin(obs_yaw)
    gx = co * corners[:, 0] - so * corners[:, 1] + obs_xy[0]
    gy = so * corners[:, 0] + co * corners[:, 1] + obs_xy[1]
    ce, se = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    lx = ce * (gx - ego_xy[0]) + se * (gy - ego_xy[1])
    ly = -se * (gx - ego_xy[0]) + ce * (gy - ego_xy[1])
    ci = gridmap.continuous_index(geom, jnp.stack([lx, ly], axis=-1))  # (4, 2)
    r0, r1 = jnp.min(ci[:, 0]), jnp.max(ci[:, 0])
    c0, c1 = jnp.min(ci[:, 1]), jnp.max(ci[:, 1])
    h = r1 - r0
    w = c1 - c0
    z = jnp.stack([c0 - 50.0 + 0.5 * w, 150.0 - r0 - 0.5 * h, w, h])
    if key is not None and sigma > 0.0:
        z = z + sigma * jax.random.normal(key, (4,), dtype=z.dtype)
    valid = measurement_valid(cp, z)
    return z, valid


def measurement_valid(cp: CostmapParams, z: jax.Array) -> jax.Array:
    """The bbox sanity gate on a [cx, cy, w, h] measurement: the implied cell
    box must sit fully inside the (rows, cols) grid with positive extent —
    the static-grid equivalent of rejecting readings outside the 150x100
    camera plane (local_costmap.cpp:331-336)."""
    r0 = 150.0 - z[1] - 0.5 * z[3]
    c0 = 50.0 + z[0] - 0.5 * z[2]
    return (
        (z[2] > 0.0) & (z[3] > 0.0)
        & (r0 >= 0.0) & (r0 + z[3] <= cp.rows)
        & (c0 >= 0.0) & (c0 + z[2] <= cp.cols)
    )
