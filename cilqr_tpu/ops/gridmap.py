"""Multi-layer grid-map substrate — functional, HBM-resident, jit-friendly.

Replaces the load-bearing slice of the vendored ANYbotics grid_map library
(``grid_map_core/include/grid_map_core/GridMap.hpp:76-234``,
``src/GridMapMath.cpp:114-145``): geometry math, position<->index transforms,
and sampling.  The circular-buffer start-index machinery is deliberately
dropped — XLA arrays re-materialize on move, so the buffer is always aligned.

Conventions (matching grid_map): cell (0, 0) is the *top-left* corner at the
(+x, +y) extreme; positions decrease as indices grow:

    pos(i, j) = center + (length/2 - res/2) - res * (i, j)

Axis 0 (rows) spans x, axis 1 (cols) spans y.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GridGeom(NamedTuple):
    """Geometry metadata of a fixed-size grid (all entries scalars/arrays so
    the pytree is jit-traceable; shapes stay static via the data array)."""

    center: jax.Array      # (2,) map-frame position of the grid center
    resolution: jax.Array  # ()
    length: jax.Array      # (2,) physical extent [len_x, len_y]


def make_geom(center_xy, resolution: float, rows: int, cols: int, dtype=jnp.float32) -> GridGeom:
    center = jnp.asarray(center_xy, dtype=dtype)
    res = jnp.asarray(resolution, dtype=dtype)
    length = jnp.asarray([rows * resolution, cols * resolution], dtype=dtype)
    return GridGeom(center, res, length)


def cell_positions(geom: GridGeom, rows: int, cols: int):
    """(rows,), (cols,) cell-center coordinates along x and y."""
    first = geom.center + 0.5 * geom.length - 0.5 * geom.resolution
    xs = first[0] - geom.resolution * jnp.arange(rows, dtype=geom.center.dtype)
    ys = first[1] - geom.resolution * jnp.arange(cols, dtype=geom.center.dtype)
    return xs, ys


def position_from_index(geom: GridGeom, idx: jax.Array) -> jax.Array:
    """Cell-center position of integer index (..., 2)
    (GridMapMath.cpp:114-129 semantics, aligned buffer)."""
    first = geom.center + 0.5 * geom.length - 0.5 * geom.resolution
    return first - geom.resolution * idx.astype(geom.center.dtype)


def index_from_position(geom: GridGeom, pos: jax.Array) -> jax.Array:
    """Integer cell index containing position (..., 2)
    (GridMapMath.cpp:131-145 semantics)."""
    top = geom.center + 0.5 * geom.length
    return jnp.floor((top - pos) / geom.resolution).astype(jnp.int32)


def continuous_index(geom: GridGeom, pos: jax.Array) -> jax.Array:
    """Real-valued index such that integer values land on cell centers."""
    first = geom.center + 0.5 * geom.length - 0.5 * geom.resolution
    return (first - pos) / geom.resolution


def in_bounds(geom: GridGeom, pos: jax.Array) -> jax.Array:
    """Boolean mask: position inside the map rectangle."""
    lo = geom.center - 0.5 * geom.length
    hi = geom.center + 0.5 * geom.length
    return jnp.all((pos >= lo) & (pos <= hi), axis=-1)




def sample_bilinear_with_grad_batched(data: jax.Array, geom: GridGeom,
                                      pos: jax.Array):
    """Per-scenario-map bilinear sample: one map per batch row.

    Args:
      data: (B, H, W) maps; geom: GridGeom with batched leaves (B, ...);
      pos: (B, N, 2) map-frame query positions.
    Returns (val (B, N), grad (B, N, 2)) — same semantics (clamping,
    gradient convention, exact corner values) as
    ``sample_bilinear_with_grad`` per row.

    TPU note: neither per-row gathers (~40 ns/element lowering) nor a flat
    (B*N, B*H*W) one-hot (would materialize gigabytes) scale here; the
    corner fetch is two one-hot MXU contractions — rows
    ``(B,N,H) @ (B,H,W) -> (B,N,W)`` then a column one-hot dot — which is
    block-diagonal sampling at dense-batched-matmul speed.  HIGHEST
    precision keeps the fetches exact (single nonzero per one-hot row).
    """
    B, H, W = data.shape
    res = geom.resolution.reshape(B, 1)
    first = geom.center + 0.5 * geom.length - 0.5 * res  # (B, 2)
    ci = (first[:, None, :] - pos) / res[:, :, None]  # (B, N, 2)
    fi = jnp.clip(ci[..., 0], 0.0, H - 1.0)
    fj = jnp.clip(ci[..., 1], 0.0, W - 1.0)
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, H - 2)
    j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, W - 2)
    ti = fi - i0
    tj = fj - j0

    hp = jax.lax.Precision.HIGHEST
    dt = data.dtype
    row0 = jax.nn.one_hot(i0, H, dtype=dt)      # (B, N, H)
    row1 = jax.nn.one_hot(i0 + 1, H, dtype=dt)
    R0 = jnp.einsum("bnh,bhw->bnw", row0, data, precision=hp)
    R1 = jnp.einsum("bnh,bhw->bnw", row1, data, precision=hp)
    col0 = jax.nn.one_hot(j0, W, dtype=dt)      # (B, N, W)
    col1 = jax.nn.one_hot(j0 + 1, W, dtype=dt)
    v00 = jnp.sum(R0 * col0, axis=-1)
    v01 = jnp.sum(R0 * col1, axis=-1)
    v10 = jnp.sum(R1 * col0, axis=-1)
    v11 = jnp.sum(R1 * col1, axis=-1)

    return _bilinear_tail(v00, v01, v10, v11, ti, tj, -1.0 / res)


def sample_nearest(data: jax.Array, geom: GridGeom, pos: jax.Array) -> jax.Array:
    """atPosition-style nearest-cell lookup (GridMap.hpp:166), clamped at the
    border.  pos: (..., 2) -> values (...,)."""
    idx = index_from_position(geom, pos)
    i = jnp.clip(idx[..., 0], 0, data.shape[0] - 1)
    j = jnp.clip(idx[..., 1], 0, data.shape[1] - 1)
    return data[i, j]


def _bilinear_tail(v00, v01, v10, v11, ti, tj, inv):
    """Shared interpolation + gradient tail of the bilinear samplers.

    ``inv`` = d index / d pos = -1/resolution on both axes (indices grow
    against position); broadcastable against the corner values.  One
    definition keeps the single-map, batched-map, and (by mirrored ops)
    in-kernel samplers semantically locked together."""
    v0 = v00 * (1 - tj) + v01 * tj
    v1 = v10 * (1 - tj) + v11 * tj
    val = v0 * (1 - ti) + v1 * ti

    dv_di = v1 - v0
    dv_dj = (v01 - v00) * (1 - ti) + (v11 - v10) * ti
    grad = jnp.stack([dv_di * inv, dv_dj * inv], axis=-1)
    return val, grad


def sample_bilinear_with_grad(data: jax.Array, geom: GridGeom, pos: jax.Array,
                              use_onehot: bool = True):
    """Bilinear interpolation + spatial gradient in map-frame coordinates.

    Returns (value (...,), grad (..., 2)) with grad = d value / d pos.
    Border cells clamp (gradient follows the clamped interpolant).

    TPU note: XLA lowers per-query gathers poorly (~8 ms for 200k queries on
    v5e); the default fetches all four corners with a single one-hot matmul
    against a 4-column shifted-map matrix — exact (one nonzero per row,
    f32) and ~6x faster on the MXU.  ``use_onehot=False`` keeps the plain
    gather (useful for very large maps where the (Q, cells) one-hot would
    dominate).
    """
    H, W = data.shape
    ci = continuous_index(geom, pos)  # (..., 2)
    fi = jnp.clip(ci[..., 0], 0.0, H - 1.0)
    fj = jnp.clip(ci[..., 1], 0.0, W - 1.0)
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, H - 2)
    j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, W - 2)
    ti = fi - i0
    tj = fj - j0

    if use_onehot:
        flat = data.reshape(-1)
        # corner offsets 0, +1, +W, +W+1 never wrap: i0 <= H-2, j0 <= W-2
        M4 = jnp.stack(
            [flat, jnp.roll(flat, -1), jnp.roll(flat, -W), jnp.roll(flat, -W - 1)],
            axis=-1,
        )  # (H*W, 4)
        idx = i0 * W + j0
        shape = idx.shape
        oh = jax.nn.one_hot(idx.reshape(-1), H * W, dtype=data.dtype)
        # HIGHEST precision: the MXU default truncates the fetched cell
        # values to bf16 (up to 0.25 occupancy error at the [0, 100] scale)
        corners = jnp.matmul(
            oh, M4, precision=jax.lax.Precision.HIGHEST
        ).reshape(shape + (4,))
        v00, v01, v10, v11 = (corners[..., 0], corners[..., 1],
                              corners[..., 2], corners[..., 3])
    else:
        v00 = data[i0, j0]
        v01 = data[i0, j0 + 1]
        v10 = data[i0 + 1, j0]
        v11 = data[i0 + 1, j0 + 1]

    return _bilinear_tail(v00, v01, v10, v11, ti, tj, -1.0 / geom.resolution)


def rasterize_polygon(geom: GridGeom, rows: int, cols: int, vertices: jax.Array) -> jax.Array:
    """(rows, cols) float mask of cells whose centers lie inside the convex
    polygon ``vertices`` (K, 2) given in CCW or CW order.

    TPU-native replacement of grid_map's ``PolygonIterator``
    (PolygonIterator.cpp + Polygon::isInside): a vectorized all-same-side
    half-plane test instead of a per-cell ray cast.
    """
    xs, ys = cell_positions(geom, rows, cols)
    px = xs[:, None]  # (rows, 1)
    py = ys[None, :]  # (1, cols)
    v = vertices
    vn = jnp.roll(vertices, -1, axis=0)
    # cross(edge, point - vertex) per edge: (K, rows, cols)
    ex = (vn[:, 0] - v[:, 0])[:, None, None]
    ey = (vn[:, 1] - v[:, 1])[:, None, None]
    rx = px[None, :, :] - v[:, 0][:, None, None]
    ry = py[None, :, :] - v[:, 1][:, None, None]
    cross = ex * ry - ey * rx
    inside = jnp.all(cross >= 0, axis=0) | jnp.all(cross <= 0, axis=0)
    return inside.astype(geom.center.dtype)


def submap_mask(rows: int, cols: int, start: jax.Array, size: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(rows, cols) mask of the rectangular submap [start, start+size) —
    the vectorized ``SubmapIterator`` (grid_map SubmapIterator.cpp), used by
    the tracked-bbox rasterization (local_costmap.cpp:358-371)."""
    i = jnp.arange(rows)[:, None]
    j = jnp.arange(cols)[None, :]
    m = (i >= start[0]) & (i < start[0] + size[0]) & (j >= start[1]) & (j < start[1] + size[1])
    return m.astype(dtype)


def confidence_ellipse(cov: jax.Array, chisquare_val: float = 2.4477):
    """2x2 covariance -> (half_major, half_minor, angle), batched.

    Closed-form equivalent of ``getConfidenceEllipse``
    (local_costmap.cpp:410-454): half axes chi*sqrt(eigenvalue), angle of the
    major eigenvector wrapped to [0, 2pi).  Eigendecomposition delegated to
    ``ops.eig2x2.eigh2x2`` (one implementation of the delicate closed form).
    """
    from cilqr_tpu.ops.eig2x2 import eigh2x2

    w, V = eigh2x2(cov)
    w_lo, w_hi = w[..., 0], w[..., 1]
    v_hi = V[..., :, 1]  # major eigenvector (column for the larger value)
    angle = jnp.arctan2(v_hi[..., 1], v_hi[..., 0])
    angle = jnp.where(angle < 0, angle + 2 * jnp.pi, angle)
    half_major = chisquare_val * jnp.sqrt(jnp.maximum(w_hi, 0.0))
    half_minor = chisquare_val * jnp.sqrt(jnp.maximum(w_lo, 0.0))
    return half_major, half_minor, angle


def ellipse_mask(
    geom: GridGeom,
    rows: int,
    cols: int,
    center: jax.Array,
    half_axes: jax.Array,
    rotation: jax.Array,
) -> jax.Array:
    """(rows, cols) bool mask of cells inside a rotated ellipse.

    Matches grid_map's ``EllipseIterator::isInside``
    (EllipseIterator.cpp:84-90): the quadratic form uses the transform
    [[cos, sin], [sin, -cos]] and tests <= 1 against the squared half-axes.
    """
    xs, ys = cell_positions(geom, rows, cols)
    dx = xs[:, None] - center[0]
    dy = ys[None, :] - center[1]
    c, s = jnp.cos(rotation), jnp.sin(rotation)
    u = c * dx + s * dy
    w = s * dx - c * dy
    q = (u / half_axes[0]) ** 2 + (w / half_axes[1]) ** 2
    return q <= 1.0
