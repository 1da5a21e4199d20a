"""Separating-axis-theorem OBB collision — jittable ground-truth checker.

Reference semantics: ``CILQR/src/ilqr/include/ilqr/Experiment.cpp:2-69``
(the experiment utility whose ilqr::Vehicle message headers are missing from
the snapshot).  A vehicle is (x, y, yaw, length, width).
"""

from __future__ import annotations

import jax.numpy as jnp


def obb_corners(x, y, yaw, length, width):
    """(…, 4, 2) rectangle corners (Experiment.cpp:13-28 ordering)."""
    hl, hw = length / 2.0, width / 2.0
    local = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]
    ) * jnp.stack([jnp.broadcast_to(hl, ()), jnp.broadcast_to(hw, ())])
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rx = local[:, 0] * c - local[:, 1] * s + x
    ry = local[:, 0] * s + local[:, 1] * c + y
    return jnp.stack([rx, ry], axis=-1)


def is_collision(v1, v2) -> jnp.ndarray:
    """SAT test between two (x, y, yaw, length, width) tuples -> bool scalar.

    Mirrors ``isCollision`` (Experiment.cpp:30-68): 4 candidate axes from
    the two rectangles' edges, overlap on every axis => collision.
    """
    c1 = obb_corners(*v1)
    c2 = obb_corners(*v2)

    def edge_axis(c, i, j):
        return jnp.arctan2(c[j, 1] - c[i, 1], c[j, 0] - c[i, 0])

    axes = jnp.stack(
        [edge_axis(c1, 0, 1), edge_axis(c1, 0, 3), edge_axis(c2, 0, 1), edge_axis(c2, 0, 3)]
    )
    ca, sa = jnp.cos(axes), jnp.sin(axes)  # (4,)
    p1 = c1[:, 0][None, :] * ca[:, None] + c1[:, 1][None, :] * sa[:, None]  # (4, 4)
    p2 = c2[:, 0][None, :] * ca[:, None] + c2[:, 1][None, :] * sa[:, None]
    sep = (jnp.max(p1, axis=1) < jnp.min(p2, axis=1)) | (
        jnp.max(p2, axis=1) < jnp.min(p1, axis=1)
    )
    return ~jnp.any(sep)
