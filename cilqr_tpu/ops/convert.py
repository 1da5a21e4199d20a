"""Occupancy-grid <-> grid-layer conversions.

Functional equivalents of the load-bearing ``GridMapRosConverter`` slice
(``grid_map_ros/src/GridMapRosConverter.cpp``: ``toOccupancyGrid`` :271,
``fromOccupancyGrid`` :225, ``toMessage`` :82): the transport message
becomes a plain pytree; the value scaling/NaN semantics are preserved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cilqr_tpu.ops import gridmap


class OccupancyGrid(NamedTuple):
    """nav_msgs/OccupancyGrid payload as a pytree: int8 data in [-1, 100]
    (-1 = unknown), plus map_server-style geometry (origin = lower-left)."""

    data: jax.Array       # (rows, cols) int8 in our grid orientation
    resolution: jax.Array
    origin_xy: jax.Array  # (2,) position of the lower-left corner
    origin_yaw: jax.Array


def to_occupancy_grid(layer: jax.Array, geom: gridmap.GridGeom,
                      data_min: float, data_max: float,
                      origin_yaw=None) -> OccupancyGrid:
    """GridMapRosConverter::toOccupancyGrid semantics: linearly map
    [data_min, data_max] -> [0, 100], NaN -> -1 (unknown)."""
    span = data_max - data_min
    scaled = (layer - data_min) / span * 100.0
    occ = jnp.clip(jnp.round(scaled), 0.0, 100.0)
    occ = jnp.where(jnp.isnan(layer), -1.0, occ).astype(jnp.int8)
    origin = geom.center - 0.5 * geom.length
    yaw = jnp.zeros((), geom.center.dtype) if origin_yaw is None else origin_yaw
    return OccupancyGrid(occ, geom.resolution, origin, yaw)


def from_occupancy_grid(msg: OccupancyGrid, data_min: float = 0.0,
                        data_max: float = 100.0):
    """Inverse conversion: -1 (unknown) -> NaN, [0, 100] -> [min, max].
    Returns (layer, GridGeom)."""
    rows, cols = msg.data.shape
    vals = msg.data.astype(jnp.float32)
    layer = data_min + vals / 100.0 * (data_max - data_min)
    layer = jnp.where(msg.data < 0, jnp.nan, layer)
    length = jnp.asarray(
        [rows, cols], layer.dtype
    ) * msg.resolution
    center = msg.origin_xy + 0.5 * length
    geom = gridmap.GridGeom(center, msg.resolution, length)
    return layer, geom


class GridMapMessage(NamedTuple):
    """grid_map_msgs/GridMap payload (toMessage, GridMapRosConverter.cpp:82):
    named layers + shared geometry."""

    layers: tuple            # tuple of layer names (static)
    data: jax.Array          # (L, rows, cols)
    geom: gridmap.GridGeom
    frame_origin_xy: jax.Array
    frame_origin_yaw: jax.Array


def to_gridmap_message(layer_dict: dict, geom: gridmap.GridGeom,
                       origin_xy, origin_yaw) -> GridMapMessage:
    names = tuple(sorted(layer_dict))
    data = jnp.stack([layer_dict[n] for n in names])
    return GridMapMessage(names, data, geom, origin_xy, origin_yaw)


def layer(msg: GridMapMessage, name: str) -> jax.Array:
    return msg.data[msg.layers.index(name)]
