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
    """Static row-window size WR, rounded up to a sublane multiple.

    The offset loop must cover o = lr - s up to lr_max - 0 where
    lr = ii - row0 with row0 = align8(min ii) - 8: lr in [8, 15] at the
    minimum plus the tile's integer index spread (<= extent - 1), so
    o_max = extent + 14 and the loop bound WR (= WR8 - 8) must be
    >= extent + 14.  (The original ``extent + 8`` sizing silently missed
    o in (round8(extent + 8), extent + 14] for most extents mod 8 —
    including the production extent 43 — caught by the shear kernel's
    fallback-path test at cols=56.)"""
    extent = _col_extent(res_v, res_g, cols)
    return ((extent + 14) + 7) // 8 * 8


def supports(rows: int, cols: int, res_v: float, res_g: float,
             H: int, W: int) -> bool:
    """Static eligibility: map fits VMEM, the column window fits one
    128-lane roll, and the row window fits the (padded) map height."""
    Hp = -(-H // _TS) * _TS
    Wp = -(-W // _TL) * _TL
    if (Hp + 2 * _TS) * Wp * 4 > _VMEM_MAP_BYTES:
        return False
    if cols > _TL:  # one lane tile per row band (the reference grids fit)
        return False
    if _col_extent(res_v, res_g, cols) > _TL - 1:
        return False
    if _window_rows(res_v, res_g, cols) > Hp:
        return False
    return True


def _tile_window_values(t, rows: int, cols: int, res_v: float, H: int,
                        W: int, Wpad: int, WR: int, map_ref, scal):
    """The direct window-gather tile: exact for EVERY pose (window origins
    derive from clamped index minima), ~(WR+1) gather+select pairs.  Kept
    as the per-tile fallback of the shear kernel and the body of the
    legacy kernels."""
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
    # map block carries _TS edge-padded rows at its top AND bottom; row0
    # may go to -_TS and the physical slice [row0 + _TS, row0 + _TS + WR8)
    # stays in range).  The upper clamp is Hp - WR8 + _TS, NOT Hp - WR8:
    # with the tighter clamp a bottom-clipped window inflates lr to up to
    # WR8 - 1 while the offset loop below only covers lr <= WR + s, so
    # near-border poses silently read 0 instead of the edge-clamped map
    # (caught by round-4 review; the extra _TS bottom pad rows make the
    # relaxed clamp safe and restore lr <= WR - 1 when clipped).
    WR8 = WR + _TS
    Hp = -(-H // _TS) * _TS
    row0 = pl.multiple_of(
        jnp.clip((jnp.min(ii) // _TS) * _TS - _TS, -_TS, Hp - WR8 + _TS),
        _TS,
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
    return v


def _tile_body(t, rows: int, cols: int, res_v: float, H: int, W: int,
               Wpad: int, WR: int, map_ref, scal, out_ref,
               whole_map: bool = False):
    v = _tile_window_values(t, rows, cols, res_v, H, W, Wpad, WR,
                            map_ref, scal)
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


def supports_shear(rows: int, cols: int, res_v: float, res_g: float,
                   H: int, W: int) -> bool:
    """Static eligibility for the shear-decomposition kernel: the whole
    scenario's sheared row extent fits one 128-lane scratch, both map
    orientations fit VMEM, and the window fallback (used by border tiles)
    is itself supported."""
    if cols > _TL:
        return False
    k = res_v / res_g
    # whole-scenario sheared row span + m0 slack (12) + floor noise (4)
    # + window headroom must fit the 128-row scratch
    if k * math.sqrt(2.0) * (rows - 1) + 28 > _TL:
        return False
    # whole-scenario u span must fit the scratch's 128 LANES too: the shear
    # build covers u in [u0a, u0a + 127] and the tile gathers index it with
    # lane_idx = u - u0a; the span bound is k*|cos|*(cols-1)+k*|sin|*(rows-1)
    # <= k*hypot(rows-1, cols-1), plus u0a's align-down (<= 7) and the
    # floor/corner-vs-elementwise slack (~2).  Without this check,
    # wide-short grids (e.g. 64x126 at k=1) pass the m-axis check above and
    # silently gather garbage for INTERIOR poses (round-4 review,
    # reproduced: 292/8064 wrong cells at yaw=1.45).
    if k * math.hypot(rows - 1, cols - 1) + 12 > _TL:
        return False
    Hp8 = -(-H // _TS) * _TS
    Wp8 = -(-W // _TS) * _TS
    if Wp8 < _TL or Hp8 < _TL:
        return False
    Wp128 = -(-W // _TL) * _TL
    Hp128 = -(-H // _TL) * _TL
    if 4 * ((Hp8 + 2 * _TS) * Wp128 + Wp8 * Hp128) > _VMEM_MAP_BYTES:
        return False
    return supports(rows, cols, res_v, res_g, H, W)


def _shear_offsets(rows: int, cols: int, res_v: float, res_g: float):
    """Static gather-offset count for the shear kernel's tile stage.

    The per-group gather ``take_along_axis(wsl[o:o+8], lane_idx)`` reads
    row ``o + s`` at sublane s, so the offsets o must cover the tile range
    of ``m_loc - s``: the floor-noise band (3 ints), the sublane drift
    |Pi - 1|*7 with Pi = k/max(|cos|,|sin|) in [k, k*sqrt(2)], and up to 7
    from aligning the window base down to a sublane multiple."""
    k = res_v / res_g
    drift = max(abs(1.0 - k), abs(1.0 - k * math.sqrt(2.0)))
    off = 8 + 4 + math.ceil(drift * 7.0)
    wsl = -(-(off + 8) // _TS) * _TS
    return off, wsl


def _kernel_shear(T: int, rows: int, cols: int, res_v: float, H: int,
                  W: int, Wpad: int, WR: int, OFF: int, WSL: int, map_ref,
                  mapT_ref, scl_ref, gscl_ref, out_ref, s_ref):
    """Shear-decomposition resample: ONE whole-scenario lane-gather builds
    a sheared map copy S with S[m, u] = map[clip(m + m0 + floor(beta*u)),
    u'] (mode A; axes swap in mode B), where beta = -tan(yaw) (|beta| <= 1
    by mode choice).  Because m = rowidx - floor(beta*colidx) is affine in
    (i, j) with its LANE slope cancelled exactly, each 8x128 output tile's
    gather range shrinks from the window extent (~WR+1 = 57 offsets at the
    production resolutions) to OFF (~17) offsets, and the per-tile lane
    rolls disappear entirely.  Border-touching tiles (any clamping
    possibly engaged, detected by conservative scalar corner bounds) take
    the exact direct-window fallback via pl.when, so the kernel is
    bit-exact for every pose.  Measured motivation
    (scripts/microbench_vpu.py): a lane gather costs ~8-13 issue slots per
    element and a dynamic roll ~11-16 — op COUNT, not arithmetic, bound
    the old kernel at ~14.7 us/map."""
    f32 = jnp.float32
    first_x = scl_ref[0, 0, 0]
    first_y = scl_ref[0, 0, 1]
    ego_x = scl_ref[0, 0, 2]
    ego_y = scl_ref[0, 0, 3]
    cyaw = scl_ref[0, 0, 4]
    syaw = scl_ref[0, 0, 5]
    # slot 6 encodes (mode, eps): |v| < 1.5 -> mode A; sign(v) = eps, the
    # m-axis flip that keeps the sublane drift Pi = eps*(Vi - beta*Ui) > 0
    mode_eps = scl_ref[0, 0, 6]
    modeA = jnp.abs(mode_eps) < 1.5
    eps = jnp.where(mode_eps >= 0.0, 1.0, -1.0)
    beta = scl_ref[0, 0, 7]   # already eps-folded (beta_p = eps * beta)
    u0a = scl_ref[0, 0, 8]    # int-valued f32, multiple of 8
    m0 = scl_ref[0, 0, 9]     # int-valued f32
    # whole-scenario interiority (wrapper corner bounds) + the tile-window
    # base predictor: w0(t) ~ mw0 + dPi8*t (the affine min of m_loc - s
    # shifts EXACTLY linearly per 8-row tile, so two scalars replace the
    # per-tile corner chains and the vector->scalar min readback that cost
    # ~170 ns/tile, measured)
    interior_s = scl_ref[0, 0, 10] > 0.5
    mw0 = scl_ref[0, 0, 11]
    dPi8 = scl_ref[0, 0, 12]
    top_x = gscl_ref[0, 0]
    top_y = gscl_ref[0, 1]
    res_g = gscl_ref[0, 2]
    scal = (first_x, first_y, ego_x, ego_y, cyaw, syaw, top_x, top_y, res_g)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (_TS, _TL), 0)

    @pl.when(interior_s)
    def _():
        u0i = pl.multiple_of(u0a.astype(jnp.int32), _TS)

        # ---- per-scenario shear build: S'[u, m] = map[clip(m+m0+sig(u)), u]
        # physical row = u; lane = m (int iota: Mosaic has no f32 iota)
        p_r = jax.lax.broadcasted_iota(jnp.int32, (_TL, _TL), 0).astype(f32)
        m_l = jax.lax.broadcasted_iota(jnp.int32, (_TL, _TL), 1).astype(f32)
        sig = jnp.floor(beta * (u0a + p_r))
        cliphi = jnp.where(modeA, H - 1.0, W - 1.0)
        idx = jnp.clip(eps * (m0 + m_l + sig), 0.0, cliphi).astype(jnp.int32)

        def gather_lane_tiles(src, ix):
            """take_along_axis from a multiple-of-128-lane source: Mosaic's
            gather wants indices shaped like its input, so gather each
            128-lane tile with clamped local indices and select."""
            n = src.shape[1] // _TL
            out = jnp.take_along_axis(src[:, :_TL],
                                      jnp.clip(ix, 0, _TL - 1), axis=1)
            for q in range(1, n):
                sub = src[:, q * _TL : (q + 1) * _TL]
                loc = jnp.clip(ix - q * _TL, 0, _TL - 1)
                g = jnp.take_along_axis(sub, loc, axis=1)
                out = jnp.where(ix >= q * _TL, g, out)
            return out

        @pl.when(modeA)
        def _():
            src = mapT_ref[pl.ds(u0i, _TL), :]        # (128, Hp128): u=col
            s_ref[...] = jnp.swapaxes(gather_lane_tiles(src, idx), 0, 1)

        @pl.when(jnp.logical_not(modeA))
        def _():
            src = map_ref[pl.ds(u0i + _TS, _TL), :]   # (128, Wp128): u=row
            s_ref[...] = jnp.swapaxes(gather_lane_tiles(src, idx), 0, 1)

        for t in range(T):
            ri = jax.lax.broadcasted_iota(jnp.int32, (_TS, _TL), 0) + t * _TS
            ci = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (_TS, _TL), 1), cols - 1)
            x_v = first_x - res_v * ri.astype(f32)
            y_v = first_y - res_v * ci.astype(f32)
            gx = x_v * cyaw - y_v * syaw + ego_x
            gy = x_v * syaw + y_v * cyaw + ego_y
            fi_fl = jnp.floor((top_x - gx) / res_g)
            fj_fl = jnp.floor((top_y - gy) / res_g)
            u_pl = jnp.where(modeA, fj_fl, fi_fl)
            v_pl = jnp.where(modeA, fi_fl, fj_fl)
            m_loc = (eps * v_pl - jnp.floor(beta * u_pl)
                     - m0).astype(jnp.int32)
            lane_idx = (u_pl - u0a).astype(jnp.int32)
            # predicted window base (exact-affine shift per tile; the <= 7
            # alignment residue and prediction slack are in OFF's budget)
            w0f = jnp.floor((mw0 + dPi8 * t) / _TS) * _TS
            w0 = pl.multiple_of(
                jnp.clip(w0f.astype(jnp.int32), 0, _TL - WSL), _TS)
            wsl = s_ref[pl.ds(w0, WSL), :]
            mrel = m_loc - w0
            v = jnp.zeros((_TS, _TL), f32)
            for o in range(OFF):
                g = jnp.take_along_axis(wsl[o : o + _TS, :],
                                        lane_idx, axis=1)
                v = jnp.where(mrel == o + s_iota, g, v)
            out_ref[0, t * _TS : (t + 1) * _TS, :] = v

    @pl.when(jnp.logical_not(interior_s))
    def _():
        for t in range(T):
            vw = _tile_window_values(t, rows, cols, res_v, H, W, Wpad, WR,
                                     map_ref, scal)
            out_ref[0, t * _TS : (t + 1) * _TS, :] = vw


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 10))
def _sample_shear(rows: int, cols: int, res_v: float, WR: int, OFF: int,
                  WSL: int, global_map, gscl, firsts, egos_cs,
                  interpret: bool):
    H, W = global_map.shape
    Hp8 = -(-H // _TS) * _TS
    Wp8 = -(-W // _TS) * _TS
    Hp128 = -(-H // _TL) * _TL
    Wp128 = -(-W // _TL) * _TL
    gm32 = global_map.astype(jnp.float32)
    # same padded layout as _sample (the fallback tiles share it) plus an
    # edge-padded transpose for the mode-A shear build
    mpad = jnp.pad(gm32, ((_TS, Hp8 - H + _TS), (0, Wp128 - W)), mode="edge")
    mtpad = jnp.pad(gm32.T, ((0, Wp8 - W), (0, Hp128 - H)), mode="edge")
    B = firsts.shape[0]
    T = -(-rows // _TS)

    top_x, top_y, res_g = gscl[0, 0], gscl[0, 1], gscl[0, 2]
    first_x, first_y = firsts[:, 0], firsts[:, 1]
    ego_x, ego_y = egos_cs[:, 0], egos_cs[:, 1]
    c, s = egos_cs[:, 2], egos_cs[:, 3]
    k = res_v / res_g
    A0 = (top_x - ego_x - first_x * c + first_y * s) / res_g
    Ai, Aj = k * c, -k * s
    B0 = (top_y - ego_y - first_x * s - first_y * c) / res_g
    Bi, Bj = k * s, k * c
    modeA = jnp.abs(Aj) <= jnp.abs(Bj)
    beta = jnp.where(modeA, Aj, Bj) / jnp.where(modeA, Bj, Aj)
    U0 = jnp.where(modeA, B0, A0)
    Ui = jnp.where(modeA, Bi, Ai)
    Uj = jnp.where(modeA, Bj, Aj)
    rr, cc = float(rows - 1), float(cols - 1)

    def corner_min(c0, ci_, cj_):
        vals = (c0, c0 + cj_ * cc, c0 + ci_ * rr, c0 + ci_ * rr + cj_ * cc)
        return jnp.minimum(jnp.minimum(vals[0], vals[1]),
                           jnp.minimum(vals[2], vals[3]))

    ulimit = jnp.where(modeA, float(Wp8 - _TL), float(Hp8 - _TL))
    u0a = jnp.clip(jnp.floor(jnp.floor(corner_min(U0, Ui, Uj)) / _TS) * _TS,
                   0.0, ulimit)
    V0 = jnp.where(modeA, A0, B0)
    Vi = jnp.where(modeA, Ai, Bi)
    Vj = jnp.where(modeA, Aj, Bj)
    # eps flips the m axis so the sublane drift Pi = eps*(Vi - beta*Ui)
    # stays positive (|Pi| in [k, k*sqrt(2)]) — without it, cos(yaw) < 0
    # (or mode-B sin < 0) would double the tile gather-offset range
    eps = jnp.where(Vi - beta * Ui >= 0.0, 1.0, -1.0)
    beta_p = eps * beta
    P0 = eps * V0 - beta_p * U0
    Pi = eps * Vi - beta_p * Ui
    Pj = eps * Vj - beta_p * Uj
    # slack 12: floor-noise band (2) + the tile window's align-down (7)
    # + margin, so m_loc - s >= 0 for every interior element
    m0 = jnp.floor(corner_min(P0, Pi, Pj)) - 12.0

    # whole-scenario interiority: every unclamped index at least 0.25
    # cells inside both map borders -> every tile takes the shear path
    # (the margins absorb the corner-affine vs elementwise float mismatch)
    def corner_max(c0, ci_, cj_):
        vals = (c0, c0 + cj_ * cc, c0 + ci_ * rr, c0 + ci_ * rr + cj_ * cc)
        return jnp.maximum(jnp.maximum(vals[0], vals[1]),
                           jnp.maximum(vals[2], vals[3]))

    interior_s = (
        (corner_min(A0, Ai, Aj) >= 0.25)
        & (corner_max(A0, Ai, Aj) <= H - 1.75)
        & (corner_min(B0, Bi, Bj) >= 0.25)
        & (corner_max(B0, Bi, Bj) <= W - 1.75)
    )
    # tile-window base predictor: the affine min of (m_loc - s) over tile
    # t is EXACTLY mw0 + (8*Pi)*t, so the kernel derives each window base
    # from two scalars instead of per-tile corner chains / vector mins
    mw0 = (P0 - m0 + jnp.minimum(Pj * cc, 0.0)
           + jnp.minimum((Pi - 1.0) * 7.0, 0.0) - 2.0)
    dPi8 = Pi * 8.0

    scl = jnp.stack(
        [first_x, first_y, ego_x, ego_y, c, s,
         jnp.where(modeA, 1.0, 2.0) * eps, beta_p, u0a, m0,
         interior_s.astype(jnp.float32), mw0, dPi8,
         jnp.zeros_like(mw0), jnp.zeros_like(mw0), jnp.zeros_like(mw0)],
        axis=1).astype(jnp.float32)[:, None, :]   # (B, 1, 16)

    kern = functools.partial(
        _kernel_shear, T, rows, cols, float(res_v), H, W, Wp128, WR, OFF, WSL
    )
    cost = pl.CostEstimate(
        flops=B * (T * 3 * 3 * _TS * _TL + 2 * _TL * _TL * 3),
        bytes_accessed=4 * ((Hp8 + 2 * _TS) * Wp128 + Wp8 * Hp128
                            + B * T * _TS * _TL),
        transcendentals=0,
    )
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(mpad.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mtpad.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, T * _TS, _TL), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T * _TS, _TL), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_TL, _TL), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(mpad, mtpad, scl, jnp.asarray(gscl, jnp.float32))
    return out[:, :rows, :cols]


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
                   ((_TS, Hp - H + _TS), (0, Wp - W)), mode="edge")
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
    algo: str = "auto",
) -> jax.Array:
    """Batched drop-in for ``vmap(costmap.sample_prior)``: (B, rows, cols)
    nearest-cell resample of one shared global map at B vehicle frames.

    ``geoms`` carries batched leaves (B, ...); ``res_v``/``res_g`` are the
    STATIC vehicle/global resolutions (the traced geometry leaves stay
    dynamic — only the window sizing needs Python floats).  Eligibility
    must be checked by the caller via ``supports``.  ``interpret=None``
    auto-selects the Pallas interpreter on CPU.

    ``algo``: ``"shear"`` (3 gathers/tile via the exact shear
    decomposition, ``supports_shear`` required), ``"window"`` (the direct
    per-tile window gather), or ``"auto"`` (shear when supported).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if algo == "auto":
        algo = ("shear" if supports_shear(rows, cols, float(res_v),
                                          float(res_g),
                                          int(global_map.shape[0]),
                                          int(global_map.shape[1]))
                else "window")
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
    if algo == "shear":
        OFF, WSL = _shear_offsets(rows, cols, float(res_v), float(res_g))
        return _sample_shear(
            rows, cols, float(res_v), WR, OFF, WSL, global_map, gscl,
            firsts, egos_cs, bool(interpret),
        )
    return _sample(
        rows, cols, float(res_v), WR, global_map, gscl, firsts, egos_cs,
        bool(interpret), bool(fused),
    )
