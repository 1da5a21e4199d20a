"""Fused Pallas backward-Riccati kernel — the solver's hot loop on the VPU.

The XLA path runs the N-step backward recursion as a ``lax.scan`` whose
per-step work (a dozen 4x4/2x4 batched contractions + the 2x2 eigen
regularization, iLQR.cpp:133-191) is far too small to amortize per-step
dispatch: at B=1024, N=50 it measures ~19 ms/iteration on v5e.  This kernel
runs the *entire* recursion in one Pallas program per 1024-scenario tile:

  * layout: every per-step quantity is (N, comp, 8, 128) — the scenario
    batch fills a full (8, 128) VPU tile per component, so each of the
    ~130 fused multiply-adds per step is one full-rate VPU op;
  * the dynamics Jacobians are *recomputed in-kernel* from (v, theta, a)
    (3 planes instead of 24) and their sparsity is unrolled by hand:
    fx = I + the 4 nonzero bicycle terms (Model.cpp:100-127), fu has 5
    nonzeros (Model.cpp:139-155);
  * the eigenvalue-clamp regularized inverse (iLQR.cpp:155-175) is the
    closed-form 2x2 path of ``ops.eig2x2`` inlined on tiles;
  * everything stays in VMEM (~8 MB at N=50) for the whole recursion.

Semantics are bit-compatible with ``solver.backward_from_derivs`` (same
recursion, same quirks); parity is locked by tests/test_riccati_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cilqr_tpu.utils.params import SolverParams

# Scenario tile: sublanes x lanes.  The native VPU register is (8, 128);
# widening the tile to (16, 128) makes every plane op TWO independent
# register ops — two scenario dependency chains interleaved through the
# serial Riccati / accept-reject pipeline (the mega kernel's measured
# binder is dependency latency, not op count: docs/ARCHITECTURE.md §7).
# Env knob CILQR_TPU_TILE_SUBLANES (read once at import; callers pad to
# TILE) so the ILP experiment is a data-layout change, not a kernel fork.
import os as _os


def _tile_sublanes() -> int:
    """Validated CILQR_TPU_TILE_SUBLANES: positive multiple of 8, else 8.

    A malformed value must not break every entry point at import time, and
    a non-multiple-of-8 value would violate TPU sublane tiling here and in
    lm_pallas (Mosaic lowering errors with no useful message) — so fall
    back to 8 with a warning, matching the never-block-a-run policy of the
    compile cache (advisor r4)."""
    raw = _os.environ.get("CILQR_TPU_TILE_SUBLANES", "8")
    try:
        ts = int(raw)
        if ts <= 0 or ts % 8 != 0:
            raise ValueError(f"must be a positive multiple of 8, got {ts}")
        return ts
    except ValueError as e:
        import warnings

        warnings.warn(
            f"cilqr_tpu: ignoring CILQR_TPU_TILE_SUBLANES={raw!r} ({e}); "
            f"using 8",
            RuntimeWarning,
            stacklevel=2,
        )
        return 8


_TS = _tile_sublanes()
_TL = 128
TILE = _TS * _TL


def pick_unroll(N: int, max_unroll: int) -> int:
    """Largest unroll factor <= max_unroll dividing the horizon.

    Shared policy for every sequential in-kernel loop (backward Riccati,
    forward rollout) so backward/forward unrolling stays in sync."""
    return next((u for u in (10, 5, 4, 3, 2) if u <= max_unroll and N % u == 0), 1)


def _kernel(N: int, dt: float, refs):
    (lx_ref, lxx_ref, lu_ref, luu_ref, vta_ref, lamb_ref, k_ref, K_ref) = refs

    lamb = lamb_ref[0, 0]

    def body(t, V):
        Vx, Vxx_flat = V  # tuple(4) of (8,128), flat tuple(16) row-major
        Vxx = [[Vxx_flat[4 * r + cc] for cc in range(4)] for r in range(4)]
        j = N - 1 - t

        v = vta_ref[0, j, 0]
        th = vta_ref[0, j, 1]
        a = vta_ref[0, j, 2]
        c = jnp.cos(th)
        s = jnp.sin(th)
        ds = v * dt + 0.5 * a * dt * dt
        dtc = dt * c
        dts = dt * s
        sds = s * ds
        cds = c * ds
        hdt2c = 0.5 * dt * dt * c
        hdt2s = 0.5 * dt * dt * s

        lx = [lx_ref[0, j, i] for i in range(4)]
        lxx = [[lxx_ref[0, j, 4 * r + cc] for cc in range(4)] for r in range(4)]
        lu = [lu_ref[0, j, i] for i in range(2)]
        luu = [[luu_ref[0, j, 0], luu_ref[0, j, 1]], [luu_ref[0, j, 1], luu_ref[0, j, 2]]]

        # Q_x = l_x + fx^T V_x   (fx rows: [1,0,dtc,-sds],[0,1,dts,cds],e2,e3)
        Qx = [
            lx[0] + Vx[0],
            lx[1] + Vx[1],
            lx[2] + dtc * Vx[0] + dts * Vx[1] + Vx[2],
            lx[3] - sds * Vx[0] + cds * Vx[1] + Vx[3],
        ]
        # Q_u = l_u + fu^T V_x   (fu cols: [hdt2c,hdt2s,dt,0], [0,0,0,dt])
        Qu = [
            lu[0] + hdt2c * Vx[0] + hdt2s * Vx[1] + dt * Vx[2],
            lu[1] + dt * Vx[3],
        ]

        # M = fx^T V_xx  (4x4)
        def left_fx(col):
            m0 = col[0]
            m1 = col[1]
            m2 = dtc * col[0] + dts * col[1] + col[2]
            m3 = -sds * col[0] + cds * col[1] + col[3]
            return [m0, m1, m2, m3]

        M = [[None] * 4 for _ in range(4)]
        for a2 in range(4):
            colv = [Vxx[r][a2] for r in range(4)]
            mcol = left_fx(colv)
            for b in range(4):
                M[b][a2] = mcol[b]

        # Q_xx = l_xx + M fx  (right-multiply sparsity)
        Qxx = [[None] * 4 for _ in range(4)]
        for b1 in range(4):
            Qxx[b1][0] = lxx[b1][0] + M[b1][0]
            Qxx[b1][1] = lxx[b1][1] + M[b1][1]
            Qxx[b1][2] = lxx[b1][2] + dtc * M[b1][0] + dts * M[b1][1] + M[b1][2]
            Qxx[b1][3] = lxx[b1][3] - sds * M[b1][0] + cds * M[b1][1] + M[b1][3]

        # N2 = fu^T V_xx  (2x4)
        N2 = [
            [hdt2c * Vxx[0][a2] + hdt2s * Vxx[1][a2] + dt * Vxx[2][a2] for a2 in range(4)],
            [dt * Vxx[3][a2] for a2 in range(4)],
        ]
        # Q_ux = N2 fx (2x4), l_ux == 0
        Qux = [[None] * 4 for _ in range(2)]
        for r in range(2):
            Qux[r][0] = N2[r][0]
            Qux[r][1] = N2[r][1]
            Qux[r][2] = dtc * N2[r][0] + dts * N2[r][1] + N2[r][2]
            Qux[r][3] = -sds * N2[r][0] + cds * N2[r][1] + N2[r][3]
        # Q_uu = l_uu + N2 fu (2x2, symmetric)
        Quu00 = luu[0][0] + hdt2c * N2[0][0] + hdt2s * N2[0][1] + dt * N2[0][2]
        Quu01 = luu[0][1] + dt * N2[0][3]
        Quu10 = luu[1][0] + hdt2c * N2[1][0] + hdt2s * N2[1][1] + dt * N2[1][2]
        Quu11 = luu[1][1] + dt * N2[1][3]
        # (Quu01 == Quu10 analytically; keep Quu01 like Eigen's symmetric view)

        # closed-form 2x2 eig clamp+shift inverse (iLQR.cpp:155-175)
        bsym = Quu01
        half_tr = 0.5 * (Quu00 + Quu11)
        half_df = 0.5 * (Quu00 - Quu11)
        disc = jnp.sqrt(half_df * half_df + bsym * bsym)
        w_lo = half_tr - disc
        w_hi = half_tr + disc
        # relative degeneracy threshold (see ops/eig2x2.py) — an absolute
        # cutoff below f32's squaring range NaNs the normalizer
        safe = jnp.abs(bsym) > 1.1920929e-07 * (jnp.abs(Quu00) + jnp.abs(Quu11))
        a_ge = Quu00 >= Quu11
        vx1 = jnp.where(safe, bsym, jnp.where(a_ge, 1.0, 0.0))
        vy1 = jnp.where(safe, w_hi - Quu00, jnp.where(a_ge, 0.0, 1.0))
        nrm = jax.lax.rsqrt(vx1 * vx1 + vy1 * vy1)
        vx1 = vx1 * nrm
        vy1 = vy1 * nrm
        i_hi = 1.0 / (jnp.maximum(w_hi, 0.0) + lamb)
        i_lo = 1.0 / (jnp.maximum(w_lo, 0.0) + lamb)
        # inv = i_hi v1 v1^T + i_lo v2 v2^T with v2 = (-vy1, vx1)
        I00 = i_hi * vx1 * vx1 + i_lo * vy1 * vy1
        I01 = (i_hi - i_lo) * vx1 * vy1
        I11 = i_hi * vy1 * vy1 + i_lo * vx1 * vx1

        # k = -Quu_inv Qu ; K = -Quu_inv Qux
        k0 = -(I00 * Qu[0] + I01 * Qu[1])
        k1 = -(I01 * Qu[0] + I11 * Qu[1])
        Krow = [[None] * 4 for _ in range(2)]
        for b in range(4):
            Krow[0][b] = -(I00 * Qux[0][b] + I01 * Qux[1][b])
            Krow[1][b] = -(I01 * Qux[0][b] + I11 * Qux[1][b])

        # W = Quu K (2x4); V_x = Q_x - K^T (Quu k); V_xx = Q_xx - K^T W
        t0 = Quu00 * k0 + Quu01 * k1
        t1 = Quu10 * k0 + Quu11 * k1
        Vx_n = tuple(
            Qx[b] - (Krow[0][b] * t0 + Krow[1][b] * t1) for b in range(4)
        )
        W = [[Quu00 * Krow[0][b] + Quu01 * Krow[1][b] for b in range(4)],
             [Quu10 * Krow[0][b] + Quu11 * Krow[1][b] for b in range(4)]]
        Vxx_n = tuple(
            Qxx[b1][b2] - (Krow[0][b1] * W[0][b2] + Krow[1][b1] * W[1][b2])
            for b1 in range(4)
            for b2 in range(4)
        )

        k_ref[0, j, 0] = k0
        k_ref[0, j, 1] = k1
        for r in range(2):
            for b in range(4):
                K_ref[0, j, 4 * r + b] = Krow[r][b]

        return (Vx_n, Vxx_n)

    Vx0 = tuple(lx_ref[0, N - 1, i] for i in range(4))
    Vxx0 = tuple(lxx_ref[0, N - 1, i] for i in range(16))
    jax.lax.fori_loop(0, N, body, (Vx0, Vxx0))


def _fwd_kernel(N: int, p, refs, max_unroll: int = 1):
    """Closed-loop rollout (iLQR.cpp:68-86) chained after the backward
    recursion, entirely in VMEM: u = U + k + K (x - X); x' = step(x, u)
    with the Model.cpp:17-30 clamp semantics."""
    import math

    (X_ref, U_ref, k_ref, K_ref, Xn_ref, Un_ref) = refs
    dt = p.timestep
    tan_hi = math.tan(p.steer_angle_max) / p.wheelbase
    tan_lo = math.tan(p.steer_angle_min) / p.wheelbase

    for i in range(4):
        Xn_ref[0, 0, i] = X_ref[0, 0, i]

    def body(j, x):
        x0, x1, x2, x3 = x
        dx = [x0 - X_ref[0, j, 0], x1 - X_ref[0, j, 1],
              x2 - X_ref[0, j, 2], x3 - X_ref[0, j, 3]]
        u0 = U_ref[0, j, 0] + k_ref[0, j, 0]
        u1 = U_ref[0, j, 1] + k_ref[0, j, 1]
        for b in range(4):
            u0 = u0 + K_ref[0, j, b] * dx[b]
            u1 = u1 + K_ref[0, j, 4 + b] * dx[b]
        Un_ref[0, j, 0] = u0
        Un_ref[0, j, 1] = u1
        # Model.cpp:19-27 clamp + Euler step
        acc = jnp.clip(u0, p.acc_min, p.acc_max)
        yr = jnp.clip(u1, x2 * tan_lo, x2 * tan_hi)
        ds = x2 * dt + 0.5 * acc * dt * dt
        c = jnp.cos(x3)
        s = jnp.sin(x3)
        nx0 = x0 + c * ds
        nx1 = x1 + s * ds
        nx2 = jnp.clip(x2 + acc * dt, 0.0, p.speed_max)
        nx3 = x3 + yr * dt
        Xn_ref[0, j + 1, 0] = nx0
        Xn_ref[0, j + 1, 1] = nx1
        Xn_ref[0, j + 1, 2] = nx2
        Xn_ref[0, j + 1, 3] = nx3
        return (nx0, nx1, nx2, nx3)

    x_init = tuple(X_ref[0, 0, i] for i in range(4))
    # Unroll: same op sequence, 1/U the loop/dynamic-index overhead
    U_f = pick_unroll(N, max_unroll)

    def bodyU(t, x):
        for i in range(U_f):
            x = body(U_f * t + i, x)
        return x

    jax.lax.fori_loop(0, N // U_f, bodyU, x_init)


def _to_tiles(x, B):
    """(B, N, C...) -> (G, N, C, 8, 128) with B = G*1024."""
    G = B // TILE
    N = x.shape[1]
    import numpy as _np
    C = int(_np.prod(x.shape[2:])) if x.ndim > 2 else 1
    x = x.reshape(G, _TS, _TL, N, C)
    return jnp.transpose(x, (0, 3, 4, 1, 2))  # (G, N, C, 8, 128)


def _from_tiles(y, B, trailing):
    """(G, N, C, 8, 128) -> (B, N, *trailing)."""
    G, N, C = y.shape[0], y.shape[1], y.shape[2]
    y = jnp.transpose(y, (0, 3, 4, 1, 2)).reshape(B, N, C)
    return y.reshape((B, N) + trailing)


@functools.partial(jax.jit, static_argnums=(0, 6))
def backward_batched(p: SolverParams, d, X, U, lamb, _unused=None, interpret=None):
    """Batched backward pass via the fused kernel.

    Args (all batched, float32):
      d: CostDerivs with leading batch axis B (B % 1024 == 0 — pad upstream
         or use the XLA scan path for small batches).
      X: (B, N+1, 4); U: (B, N, 2); lamb: (B,).
    Returns (k (B, N, 2), K (B, N, 2, 4)).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = X.shape[0]
    if B % TILE:
        raise ValueError(f"batch {B} must be a multiple of {TILE}")
    N = p.horizon
    G = B // TILE
    f32 = jnp.float32

    lx = _to_tiles(d.l_x.astype(f32), B)                        # (G,N,4,8,128)
    lxx = _to_tiles(d.l_xx.reshape(B, N, 16).astype(f32), B)    # (G,N,16,8,128)
    lu = _to_tiles(d.l_u.astype(f32), B)                        # (G,N,2,8,128)
    luu_flat = jnp.stack(
        [d.l_uu[..., 0, 0], d.l_uu[..., 0, 1], d.l_uu[..., 1, 1]], axis=-1
    ).astype(f32)
    luu = _to_tiles(luu_flat, B)                                # (G,N,3,8,128)
    # jacobian ingredients at successor states (iLQR.cpp:102-106)
    vta = jnp.stack([X[:, 1:, 2], X[:, 1:, 3], U[:, :, 0]], axis=-1).astype(f32)
    vta = _to_tiles(vta, B)                                     # (G,N,3,8,128)
    lamb_t = lamb.astype(f32).reshape(G, _TS, _TL)[:, None]     # (G,1,8,128)

    kern = functools.partial(_kernel, N, float(p.timestep))

    def kernel_entry(lx_r, lxx_r, lu_r, luu_r, vta_r, lamb_r, k_r, K_r):
        kern((lx_r, lxx_r, lu_r, luu_r, vta_r, lamb_r, k_r, K_r))

    specs = lambda c: pl.BlockSpec(
        (1, N, c, _TS, _TL), lambda g: (g, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    k_t, K_t = pl.pallas_call(
        kernel_entry,
        grid=(G,),
        in_specs=[
            specs(4), specs(16), specs(2), specs(3), specs(3),
            pl.BlockSpec((1, 1, _TS, _TL), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[specs(2), specs(8)],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, 2, _TS, _TL), f32),
            jax.ShapeDtypeStruct((G, N, 8, _TS, _TL), f32),
        ],
        interpret=interpret,
    )(lx, lxx, lu, luu, vta, lamb_t)

    k = _from_tiles(k_t, B, (2,))
    K = _from_tiles(K_t, B, (2, 4))
    return k, K


@functools.partial(jax.jit, static_argnums=(0, 5))
def backward_forward_batched(p: SolverParams, d, X, U, lamb, interpret=None):
    """One fused kernel per LM iteration: backward recursion -> k/K in
    VMEM scratch -> closed-loop forward rollout.  k/K never touch HBM.

    Returns (X_new (B, N+1, 4), U_new (B, N, 2)).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = X.shape[0]
    if B % TILE:
        raise ValueError(f"batch {B} must be a multiple of {TILE}")
    N = p.horizon
    G = B // TILE
    f32 = jnp.float32

    lx = _to_tiles(d.l_x.astype(f32), B)
    lxx = _to_tiles(d.l_xx.reshape(B, N, 16).astype(f32), B)
    lu = _to_tiles(d.l_u.astype(f32), B)
    luu_flat = jnp.stack(
        [d.l_uu[..., 0, 0], d.l_uu[..., 0, 1], d.l_uu[..., 1, 1]], axis=-1
    ).astype(f32)
    luu = _to_tiles(luu_flat, B)
    vta = jnp.stack([X[:, 1:, 2], X[:, 1:, 3], U[:, :, 0]], axis=-1).astype(f32)
    vta = _to_tiles(vta, B)
    lamb_t = lamb.astype(f32).reshape(G, _TS, _TL)[:, None]
    X_t = _to_tiles(X.astype(f32), B)        # (G, N+1, 4, 8, 128)
    U_t = _to_tiles(U.astype(f32), B)        # (G, N,   2, 8, 128)

    bw = functools.partial(_kernel, N, float(p.timestep))
    fw = functools.partial(_fwd_kernel, N, p)

    def kernel_entry(lx_r, lxx_r, lu_r, luu_r, vta_r, lamb_r, X_r, U_r,
                     Xn_r, Un_r, k_s, K_s):
        bw((lx_r, lxx_r, lu_r, luu_r, vta_r, lamb_r, k_s, K_s))
        fw((X_r, U_r, k_s, K_s, Xn_r, Un_r))

    spec = lambda steps, c: pl.BlockSpec(
        (1, steps, c, _TS, _TL), lambda g: (g, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    Xn_t, Un_t = pl.pallas_call(
        kernel_entry,
        grid=(G,),
        in_specs=[
            spec(N, 4), spec(N, 16), spec(N, 2), spec(N, 3), spec(N, 3),
            pl.BlockSpec((1, 1, _TS, _TL), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            spec(N + 1, 4), spec(N, 2),
        ],
        out_specs=[spec(N + 1, 4), spec(N, 2)],
        out_shape=[
            jax.ShapeDtypeStruct((G, N + 1, 4, _TS, _TL), f32),
            jax.ShapeDtypeStruct((G, N, 2, _TS, _TL), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, N, 2, _TS, _TL), f32),
            pltpu.VMEM((1, N, 8, _TS, _TL), f32),
        ],
        interpret=interpret,
    )(lx, lxx, lu, luu, vta, lamb_t, X_t, U_t)

    X_new = _from_tiles(Xn_t, B, (4,))
    U_new = _from_tiles(Un_t, B, (2,))
    return X_new, U_new
