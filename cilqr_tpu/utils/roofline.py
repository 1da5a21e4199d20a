"""Speed-of-light accounting for the three hot kernels (v5e roofline).

The BASELINE north star asks for the rollout/backward kernels to be
"benchmarked at speed-of-light per chip" — this module states what
speed-of-light *is* for each kernel (analytic FLOPs + HBM bytes per
invocation), which resource binds, and how far a measured time is from the
bound.  Consumed by ``scripts/speed_of_light.py`` (the full report) and by
``cilqr_tpu.benchmark`` (the ``mega_pct_of_sol`` headline field).

Peak numbers (TPU v5e, one chip — public specs; the VPU number is derived,
see below):

* HBM bandwidth: 819 GB/s.
* MXU: 197 TFLOP/s bf16 (f32 operands are truncated to bf16 by default;
  ``precision=HIGHEST`` 3-pass costs ~1/6 of that — noted where relevant).
* VPU: the spec sheets publish no VPU number.  Derivation: 8x128 lanes x
  4 ALUs x 2 FLOPs (FMA) x ~0.94 GHz core clock ~= **7.7 TFLOP/s** f32.
  Transcendentals (exp, sin/cos, sqrt, rsqrt) retire ~1 per lane per
  ``TRANSCENDENTAL_SLOTS`` VPU issue slots, so a kernel's VPU-bound time is
  ``(flops + TRANSCENDENTAL_SLOTS * transcendentals) / VPU_PEAK``.

Accounting accuracy: the FLOP formulas below are op-counts of the actual
kernel bodies (ops/lm_pallas.py, ops/uncertainty_pallas.py,
ops/sample_pallas.py) at the +-20% level — select/compare/where are counted
as 1 FLOP-slot each since they occupy VPU issue slots like adds do.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

HBM_BW = 819e9           # B/s, v5e public spec
MXU_BF16 = 197e12        # FLOP/s, v5e public spec
VPU_PEAK = 7.7e12        # FLOP/s f32, derived (see module docstring)
TRANSCENDENTAL_SLOTS = 7  # VPU issue slots charged per exp/sin/cos/sqrt


class KernelCost(NamedTuple):
    """Analytic per-invocation cost and the derived roofline bound."""

    name: str
    flops: float             # VPU/MXU FLOPs (FMA = 2)
    transcendentals: float   # exp/sin/cos/sqrt/rsqrt count
    hbm_bytes: float         # compulsory HBM traffic (in + out)

    @property
    def t_compute(self) -> float:
        """Seconds at VPU speed-of-light (these kernels are VPU kernels —
        the mega kernel's only matmul-shaped work is expressed as lane
        arithmetic, not MXU contractions)."""
        return (self.flops + TRANSCENDENTAL_SLOTS * self.transcendentals) / VPU_PEAK

    @property
    def t_memory(self) -> float:
        return self.hbm_bytes / HBM_BW

    @property
    def t_sol(self) -> float:
        return max(self.t_compute, self.t_memory)

    @property
    def bound(self) -> str:
        return "VPU compute" if self.t_compute >= self.t_memory else "HBM bandwidth"

    def report(self, measured_s: float) -> dict:
        return {
            "kernel": self.name,
            "flops": self.flops,
            "transcendentals": self.transcendentals,
            "hbm_bytes": self.hbm_bytes,
            "t_sol_us": round(self.t_sol * 1e6, 3),
            "t_compute_us": round(self.t_compute * 1e6, 3),
            "t_memory_us": round(self.t_memory * 1e6, 3),
            "binding_resource": self.bound,
            "measured_us": round(measured_s * 1e6, 3),
            "pct_of_sol": round(100.0 * self.t_sol / measured_s, 1),
        }


def mega_iteration_cost(p, S: int, M: int, K: int, has_unc: bool) -> KernelCost:
    """Per-scenario, per-LM-iteration cost of the fused solve kernel
    (``ops/lm_pallas._run_iteration`` + the forward rollout).

    Phase op-counts (per horizon step, from the kernel body):

    * closest-point tournament (lm_pallas.py:263-319): 2 FMA + ~3
      select/compare slots per sample (expanded local-frame form), ~8 ops of
      frame setup, plus a 3-candidate exact refine (3 x ~(2 Horner
      evaluations of degree-5 + rotate + distance) ~= 100 ops).
    * obstacle barriers (:419-451): per obstacle per ego disc (2 discs):
      ~24 FLOPs + 1 exp; plus ~8 ops of cos/sin disc-center setup (2 trig).
    * uncertainty-map sample (:351-398, resident-map mode): the per-lane
      block gather dominates — 4 corner copies x K lane blocks x ~3 slots
      (compare + gather + select), plus ~30 ops of bilinear + gradient.
    * control barriers + tracking derivs (:410-493): 4 exp + ~40 FLOPs.
    * Riccati step (:500-631): ~470 FLOPs (Qx/Qu/Qxx/Qux/Quu chains, the
      closed-form 2x2 eig clamp inverse (1 sqrt + 1 rsqrt + 2 div), k/K,
      Vx'/Vxx' updates).
    * forward rollout (riccati_pallas._fwd_kernel): ~45 FLOPs + 2 trig.

    HBM per scenario per iteration: X/U in + out (~(N+1)*4 + N*2 f32 each
    way) in the one-call-per-iteration mode; ~0 in the in-kernel LM loop
    (the default — traffic is once per SOLVE, not per iteration, so the
    figure below divides it by a typical 10-iteration solve).
    """
    N = p.horizon
    closest = 8 + 7 * S + 100
    obstacle = (8 + M * 2 * 24) if M else 0
    obstacle_trig = 2 if M else 0
    obstacle_exp = M * 2 if M else 0
    unc = (4 * K * 3 + 30) if has_unc else 0
    unc_exp = 1 if has_unc else 0
    ctrl = 40
    ctrl_exp = 4
    riccati = 470
    riccati_sqrt = 2
    fwd = 45
    fwd_trig = 2

    per_step_flops = closest + obstacle + unc + ctrl + riccati + fwd
    per_step_trans = obstacle_trig + obstacle_exp + unc_exp + ctrl_exp + riccati_sqrt + fwd_trig
    xu_bytes = 4 * ((N + 1) * 4 + N * 2) * 2  # in + out
    return KernelCost(
        name="lm_mega_iteration",
        flops=float(N * per_step_flops),
        transcendentals=float(N * per_step_trans),
        hbm_bytes=xu_bytes / 10.0,  # amortized over the in-kernel LM loop
    )


def propagation_cost(cp, rows: int, cols: int, band_plan=None) -> KernelCost:
    """Per-map cost of the uncertainty propagation kernel
    (``ops/uncertainty_pallas``): per (cell, window offset) the inside test
    + correlated-Gaussian weight is ~12 FLOPs + 1 exp
    (``_accumulate``'s body), over the full (2R+1)^2 window or the banded
    disc-cut offsets; plus ~10 ops/cell of field setup and the finish
    division.  HBM: prior (padded) + sx/sy/rho/psd fields in, map out —
    7 full maps of f32 (the kernel's own CostEstimate bytes model).
    """
    if band_plan is not None and band_plan.bands:
        offsets = 0
        for b, (_, br, Rb) in enumerate(band_plan.bands):
            r_disc = None
            if band_plan.disc_radii is not None:
                r_disc = band_plan.disc_radii[b]
            w = 2 * Rb + 1
            if r_disc is None:
                n_off = w * w
            else:
                # exact disc cut: offsets with di^2+dj^2 <= r_disc^2
                n_off = sum(
                    1
                    for di in range(-Rb, Rb + 1)
                    for dj in range(-Rb, Rb + 1)
                    if di * di + dj * dj <= r_disc * r_disc
                )
            offsets += n_off * br * cols
    else:
        R = cp.window_radius
        offsets = (2 * R + 1) ** 2 * rows * cols
    return KernelCost(
        name="uncertainty_propagation",
        flops=float(offsets * 12 + rows * cols * 10),
        transcendentals=float(offsets),
        hbm_bytes=float(4 * rows * cols * 7),
    )


def resample_cost(rows: int, cols: int, res_v: float, res_g: float,
                  gH: int, gW: int) -> KernelCost:
    """Per-map cost of the window-gather prior resample
    (``ops/sample_pallas``): per 8x128 output tile the kernel walks a
    WR-row window of the VMEM-resident global map with ~3 slot-ops per
    (window row, output element) — gather + select + blend (the kernel's
    own CostEstimate model, sample_pallas.py:177-181).  HBM: the global map
    is read once (shared across the scenario batch — charged per map here,
    so the per-scenario figure is conservative) plus the output tiles.
    """
    from cilqr_tpu.ops import sample_pallas as sp

    T = -(-rows // sp._TS)
    WR = sp._window_rows(res_v, res_g, cols)
    Hp = -(-gH // sp._TS) * sp._TS
    Wp = -(-gW // sp._TL) * sp._TL
    return KernelCost(
        name="prior_resample",
        flops=float(T * WR * 3 * sp._TS * sp._TL),
        transcendentals=0.0,
        hbm_bytes=float(4 * (Hp * Wp + T * sp._TS * sp._TL)),
    )
