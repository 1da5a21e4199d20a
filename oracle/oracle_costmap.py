"""NumPy oracle for the uncertainty-propagation costmap kernel.

Faithful to the reference GPU/OpenMP pipeline
(``arbitrary_transformation.cu:8-157`` + ``ARBIT.cuh:51-107``) *including* the
grid_map EllipseIterator mechanics it relies on
(``EllipseIterator.cpp:19-107``): per-cell 2x2 eigendecomposition to 95%
confidence half-axes, a bounding-box submap scan, the
[[cos, sin], [sin, -cos]] inside test, and the nomal2-weighted average
clipped to the map.
"""

from __future__ import annotations

import numpy as np

from cilqr_tpu.utils.params import CostmapParams


def nomal2(x, y, mu1, mu2, s1, s2, rho):
    """ARBIT.cuh:103-107."""
    return (
        1.0
        / (np.sqrt(1 - rho * rho) * (2 * np.pi * s1 * s2))
        * np.exp(
            (-1 / (2 * (1 - rho * rho)))
            * (
                (x - mu1) ** 2 / (s1 * s1)
                - 2 * rho * (x - mu1) * (y - mu2) / (s1 * s2)
                + (y - mu2) ** 2 / (s2 * s2)
            )
        )
    )


def cell_positions(cp: CostmapParams, center):
    rows, cols = cp.rows, cp.cols
    res = cp.resolution
    first_x = center[0] + rows * res / 2 - res / 2
    first_y = center[1] + cols * res / 2 - res / 2
    xs = first_x - res * np.arange(rows)
    ys = first_y - res * np.arange(cols)
    return xs, ys


def propagate(
    cp: CostmapParams, prior: np.ndarray, center, ego_yaw: float, faithful_rho: bool = False
) -> np.ndarray:
    """Exact EllipseIterator-style propagation (float64).

    ``faithful_rho=True`` uses the reference's formula verbatim — the
    GLOBAL-frame lever vector (correct for grid_map's globally axis-aligned
    grids) and the cross-term sign defect (ARBIT.cuh:62-63), which is
    non-PSD at some yaws; those cells fall back to the prior (matching the
    empty-footprint branch).  Default mirrors the framework's corrected
    map-frame form — the vehicle-rotated grid's lever is R(-yaw) g_g =
    (-Cy, Cx), yaw-free — see cilqr_tpu/ops/costmap.cell_sigma_rho's
    FRAME CORRECTION note.
    """
    rows, cols = prior.shape
    res = cp.resolution
    chi = cp.chisquare_val
    s, c = np.sin(ego_yaw), np.cos(ego_yaw)
    xs, ys = cell_positions(cp, center)

    out = np.zeros_like(prior)
    for i in range(rows):
        for j in range(cols):
            Cx, Cy = xs[i], ys[j]
            if faithful_rho:
                g1 = -s * Cx - c * Cy
                g2 = c * Cx - s * Cy
                t = s * c * (Cx * Cx - Cy * Cy) + Cx * Cy * (s * s - c * c)
                dxx = dyy = dxy = 0.0  # reference form: unrotated diag
            else:
                g1, g2 = -Cy, Cx
                t = g1 * g2
                # map-frame rotation of the translational diag, in the same
                # delta form as cell_sigma_rho (exact for anisotropic
                # sigmas; bit-exactly zero when sigma_x == sigma_y)
                d = cp.sigma_x**2 - cp.sigma_y**2
                dxx = -d * s * s
                dyy = d * s * s
                dxy = -d * s * c
            u, v = g1 * g1, g2 * g2
            sx = np.sqrt(cp.sigma_x**2 + dxx + cp.sigma_theta**2 * u)
            sy = np.sqrt(cp.sigma_y**2 + dyy + cp.sigma_theta**2 * v)
            rho = (dxy + cp.sigma_theta**2 * t) / (sx * sy)
            if abs(rho) >= 1.0:
                out[i, j] = prior[i, j]
                continue
            a, b, cc = sx * sx, rho * sx * sy, sy * sy

            # confidence ellipse via eigendecomposition (local_costmap.cpp:410-454)
            w, V = np.linalg.eigh(np.array([[a, b], [b, cc]]))
            major, minor = (1, 0)
            half_major = chi * np.sqrt(w[major])
            half_minor = chi * np.sqrt(w[minor])
            vmaj = V[:, major]
            angle = np.arctan2(vmaj[1], vmaj[0])

            # bbox submap of the rotated ellipse (EllipseIterator.cpp:92-107)
            ca, sa = np.cos(angle), np.sin(angle)
            hx = np.sqrt((2 * half_major * ca) ** 2 + (2 * half_minor * sa) ** 2) / 2
            hy = np.sqrt((2 * half_major * sa) ** 2 + (2 * half_minor * ca) ** 2) / 2
            i_lo = max(0, int(np.floor((xs[0] - (Cx + hx)) / res)))
            i_hi = min(rows - 1, int(np.ceil((xs[0] - (Cx - hx)) / res)))
            j_lo = max(0, int(np.floor((ys[0] - (Cy + hy)) / res)))
            j_hi = min(cols - 1, int(np.ceil((ys[0] - (Cy - hy)) / res)))

            num = 0.0
            den = 0.0
            count = 0
            for ii in range(i_lo, i_hi + 1):
                for jj in range(j_lo, j_hi + 1):
                    dx = xs[ii] - Cx
                    dy = ys[jj] - Cy
                    # inside test (EllipseIterator.cpp:84-90)
                    tx = ca * dx + sa * dy
                    ty = sa * dx - ca * dy
                    if (tx / half_major) ** 2 + (ty / half_minor) ** 2 > 1.0:
                        continue
                    f = nomal2(xs[ii], ys[jj], Cx, Cy, sx, sy, rho)
                    num += f * prior[ii, jj]
                    den += f
                    count += 1
            out[i, j] = num / den if count else prior[i, j]
    return out
