"""Pallas TPU kernel for the batched prior-map resample (nearest gather).

The full-stack batched costmap rebuilds every scenario's vehicle-frame
prior by sampling the shared global map at each cell rotated into the
global frame (``costmap.sample_prior``, mirroring
``local_costmap.cpp:242-253``).  XLA lowers the resulting (B, rows, cols)
gather at ~12 ns/element (~760 ms for 4096 scenarios at the default
152x104 grid on v5e) — 72% of the whole full-stack plan-act cycle.

TPU-native re-expression: the query grid is a ROTATED REGULAR GRID, so the
global cell index is AFFINE in the (row, col) of the vehicle map —
fi = a + p*i + q*j with |p|, |q| <= res_vehicle/res_global.  For one
8-row output tile the needed source cells therefore live in a small
axis-aligned window whose extent is bounded STATICALLY by the resolution
ratio.  Per (scenario, tile) grid step the kernel:

  1. computes the tile's global (row, col) index planes (op-for-op the
     math of ``sample_prior`` + ``index_from_position``, f32, clamped);
  2. takes their scalar minima -> window origin (row0 aligned down to the
     sublane multiple, col0 free — the column window is aligned by a
     dynamic LANE ROLL, which Mosaic lowers natively);
  3. dynamic-slices a static (WR+8, Wpad) row window of the VMEM-resident
     global map (8 extra top rows keep the group offsets non-negative),
     rolls it left by col0, keeps the first 128 lanes;
  4. gathers by 8-row groups: for each static offset o, one
     ``take_along_axis`` on the natural (8, 128) tile ``wslice[o:o+8]``
     yields win[o+s, lc] at sublane s — correct exactly where the local
     row index equals o + s; a select accumulates it.

Cost per 1024 outputs is ~(WR+1) gather+select pairs (WR = 56 at the
reference's 0.2 m vehicle / 0.5 m global resolutions) vs ~12 us for the
XLA gather: ~15-20x.  Falls back to the XLA path for maps that don't fit
VMEM or resolution ratios whose window can't cover a 128-lane tile (see
``supports``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cilqr_tpu.ops import gridmap

_TS = 8    # output tile rows (sublane)
_TL = 128  # output tile cols (lane)

# VMEM budget for the shared global map (v5e has ~16 MB; leave room for the
# row window, index planes, and the output tile)
_VMEM_MAP_BYTES = 12 * 1024 * 1024


def _col_extent(res_v: float, res_g: float, cols: int) -> int:
    """Affine index extent over an 8 x cols tile (worst rotation), +1 for
    the floor — the bound both window dimensions are sized from."""
    return math.ceil((res_v / res_g) * math.hypot(_TS - 1, cols - 1)) + 1


def _window_rows(res_v: float, res_g: float, cols: int) -> int:
    """Static row-window size WR: the tile extent +8 for sublane alignment
    of the dynamic slice start, rounded up to a sublane multiple."""
    extent = _col_extent(res_v, res_g, cols)
    return ((extent + 8) + 7) // 8 * 8


def supports(rows: int, cols: int, res_v: float, res_g: float,
             H: int, W: int) -> bool:
    """Static eligibility: map fits VMEM, the column window fits one
    128-lane roll, and the row window fits the (padded) map height."""
    Hp = -(-H // _TS) * _TS
    Wp = -(-W // _TL) * _TL
    if Hp * Wp * 4 > _VMEM_MAP_BYTES:
        return False
    if cols > _TL:  # one lane tile per row band (the reference grids fit)
        return False
    if _col_extent(res_v, res_g, cols) > _TL - 1:
        return False
    if _window_rows(res_v, res_g, cols) > Hp:
        return False
    return True


def _tile_body(t, rows: int, cols: int, res_v: float, H: int, W: int,
               Wpad: int, WR: int, map_ref, scal, out_ref,
               whole_map: bool = False):
    f32 = jnp.float32
    (first_x, first_y, ego_x, ego_y, cyaw, syaw, top_x, top_y, res_g) = scal

    # vehicle-frame cell centers (cell_positions semantics); padding lanes
    # replicate the last column so they never widen the source window
    ri = jax.lax.broadcasted_iota(jnp.int32, (_TS, _TL), 0) + t * _TS
    ci = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (_TS, _TL), 1),
                     cols - 1)
    x_v = first_x - res_v * ri.astype(f32)
    y_v = first_y - res_v * ci.astype(f32)

    # rotate to global + nearest index (sample_prior + index_from_position,
    # mirrored op-for-op), clamped at the borders (sample_nearest)
    gx = x_v * cyaw - y_v * syaw + ego_x
    gy = x_v * syaw + y_v * cyaw + ego_y
    ii = jnp.clip(jnp.floor((top_x - gx) / res_g), 0.0, H - 1.0).astype(jnp.int32)
    jj = jnp.clip(jnp.floor((top_y - gy) / res_g), 0.0, W - 1.0).astype(jnp.int32)

    # static-size source window at a dynamic (aligned) origin, extended by
    # _TS extra top rows so the group-gather offsets below stay >= 0 (the
    # map block carries _TS edge-padded rows at its top; row0 may go to
    # -_TS and the physical slice start row0 + _TS stays in range)
    WR8 = WR + _TS
    Hp = -(-H // _TS) * _TS
    row0 = pl.multiple_of(
        jnp.clip((jnp.min(ii) // _TS) * _TS - _TS, -_TS, Hp - WR8), _TS
    )
    col0 = jnp.min(jj)
    win = map_ref[pl.ds(row0 + _TS, WR8), :]
    rolled = pltpu.roll(win, Wpad - col0, axis=1)
    wslice = rolled[:, :_TL]

    lr = ii - row0   # >= _TS by construction, <= WR8 - 1
    lc = jj - col0
    # group gather: for each static row offset o, take_along_axis on the
    # natural (_TS, _TL) tile wslice[o:o+_TS] yields win[o+s, lc[s,l]] at
    # sublane s — the correct value exactly where lr == o + s.  One gather
    # per offset instead of one sublane-broadcast + gather per window row.
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (_TS, _TL), 0)
    v = jnp.zeros((_TS, _TL), f32)
    for o in range(WR8 - _TS + 1):
        g = jnp.take_along_axis(wslice[o : o + _TS, :], lc, axis=1)
        v = jnp.where(lr == o + s_iota, g, v)
    if whole_map:  # per-scenario whole-map block (1, T*_TS, _TL); t static
        out_ref[0, t * _TS : (t + 1) * _TS, :] = v
    else:          # one (1, _TS, _TL) tile block; t = program_id
        out_ref[0] = v


def _kernel(rows: int, cols: int, res_v: float, H: int, W: int, Wpad: int,
            WR: int, map_ref, scl_ref, gscl_ref, out_ref):
    scal = (scl_ref[0, 0, 0], scl_ref[0, 0, 1], scl_ref[0, 0, 2],
            scl_ref[0, 0, 3], scl_ref[0, 0, 4], scl_ref[0, 0, 5],
            gscl_ref[0, 0], gscl_ref[0, 1], gscl_ref[0, 2])
    _tile_body(pl.program_id(1), rows, cols, res_v, H, W, Wpad, WR,
               map_ref, scal, out_ref)


def _kernel_fused(T: int, rows: int, cols: int, res_v: float, H: int, W: int,
                  Wpad: int, WR: int, map_ref, scl_ref, gscl_ref, out_ref):
    """grid=(B,): all T row tiles of one scenario per grid step — amortizes
    per-step dispatch/block overhead over the whole map (the (B, T) grid
    pays it per 8-row tile)."""
    scal = (scl_ref[0, 0, 0], scl_ref[0, 0, 1], scl_ref[0, 0, 2],
            scl_ref[0, 0, 3], scl_ref[0, 0, 4], scl_ref[0, 0, 5],
            gscl_ref[0, 0], gscl_ref[0, 1], gscl_ref[0, 2])
    for t in range(T):
        _tile_body(t, rows, cols, res_v, H, W, Wpad, WR,
                   map_ref, scal, out_ref, whole_map=True)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 8, 9))
def _sample(rows: int, cols: int, res_v: float, WR: int, global_map, gscl,
            firsts, egos_cs, interpret: bool, fused: bool):
    H, W = global_map.shape
    Hp = -(-H // _TS) * _TS
    Wp = -(-W // _TL) * _TL
    # edge-pad: padded cells are never addressed (indices clamp to the real
    # extent and the roll is modulo Wp with offsets < the real window); the
    # _TS top rows let the window origin sit one sublane group above row 0
    # (see _tile_body's group gather)
    mpad = jnp.pad(global_map.astype(jnp.float32),
                   ((_TS, Hp - H), (0, Wp - W)), mode="edge")
    B = firsts.shape[0]
    T = -(-rows // _TS)
    scl = jnp.concatenate([firsts, egos_cs], axis=1).astype(jnp.float32)
    scl = jnp.pad(scl, ((0, 0), (0, 8 - scl.shape[1])))[:, None, :]  # (B,1,8)

    cost = pl.CostEstimate(
        flops=B * T * WR * 3 * _TS * _TL,
        bytes_accessed=4 * (Hp * Wp + B * T * _TS * _TL),
        transcendentals=0,
    )
    # the fused form runs all T row tiles in one grid step per scenario
    # (amortizes per-step dispatch); the (B, T) form keeps one tile per step
    if fused:
        kern = functools.partial(
            _kernel_fused, T, rows, cols, float(res_v), H, W, Wp, WR
        )
        grid = (B,)
        batch_ix = lambda b: (b, 0, 0)
        fixed2 = lambda b: (0, 0)
        fixed_scl = lambda b: (0, 0)
        out_spec = pl.BlockSpec((1, T * _TS, _TL), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(
            _kernel, rows, cols, float(res_v), H, W, Wp, WR
        )
        grid = (B, T)
        batch_ix = lambda b, t: (b, 0, 0)
        fixed2 = lambda b, t: (0, 0)
        fixed_scl = lambda b, t: (0, 0)
        out_spec = pl.BlockSpec((1, _TS, _TL), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(mpad.shape, fixed2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), batch_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), fixed_scl, memory_space=pltpu.SMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T * _TS, _TL), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(mpad, scl, jnp.asarray(gscl, jnp.float32))
    return out[:, :rows, :cols]


def sample_prior_batched_tpu(
    geoms: gridmap.GridGeom,
    rows: int,
    cols: int,
    res_v: float,
    res_g: float,
    global_map: jax.Array,
    global_geom: gridmap.GridGeom,
    ego_xys: jax.Array,
    ego_yaws: jax.Array,
    interpret=None,
    fused: bool = True,
) -> jax.Array:
    """Batched drop-in for ``vmap(costmap.sample_prior)``: (B, rows, cols)
    nearest-cell resample of one shared global map at B vehicle frames.

    ``geoms`` carries batched leaves (B, ...); ``res_v``/``res_g`` are the
    STATIC vehicle/global resolutions (the traced geometry leaves stay
    dynamic — only the window sizing needs Python floats).  Eligibility
    must be checked by the caller via ``supports``.  ``interpret=None``
    auto-selects the Pallas interpreter on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    firsts = (
        geoms.center + 0.5 * geoms.length
        - 0.5 * geoms.resolution[..., None]
    )
    top = global_geom.center + 0.5 * global_geom.length
    z = jnp.zeros_like(top[0])
    gscl = jnp.stack(
        [top[0], top[1], jnp.asarray(global_geom.resolution, top.dtype),
         z, z, z, z, z]
    ).reshape(1, 8)
    egos_cs = jnp.stack(
        [ego_xys[:, 0], ego_xys[:, 1], jnp.cos(ego_yaws), jnp.sin(ego_yaws)],
        axis=1,
    )
    WR = _window_rows(float(res_v), float(res_g), cols)
    return _sample(
        rows, cols, float(res_v), WR, global_map, gscl, firsts, egos_cs,
        bool(interpret), bool(fused),
    )
