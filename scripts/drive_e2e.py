"""E2E drive on the real TPU: costmap -> uncertainty map -> receding solve.

The /verify recipe for this repo (see .claude/skills/verify/SKILL.md): runs
the full pipeline on the real chip and probes the documented edge cases.
Run: PYTHONPATH=/root/repo python scripts/drive_e2e.py"""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp

from cilqr_tpu.ops import costmap, gridmap
from cilqr_tpu.models import reference_path as rp, solver, obstacles as obs_mod
from cilqr_tpu.models.uncertainty import UncertaintyMap
from cilqr_tpu.utils.params import CostmapParams, SolverParams

print("device:", jax.devices()[0])
f32 = jnp.float32
p = dataclasses.replace(SolverParams(), horizon=50)
cp = CostmapParams()

# synthetic global map: free lane, occupied block north of it
gm = np.zeros((256, 256), np.float32)
gm[140:170, 80:140] = 100.0
ggeom = gridmap.make_geom([130.0, -280.0], 0.5, 256, 256, dtype=f32)

s = np.linspace(0.0, 119.0, 120)
wp = np.stack([90.0 + s, -306.0 + 2.5 * np.sin(0.03 * s) + 0.01 * s], 1)
plan, n = rp.pad_global_plan(p, wp, dtype=f32)
ego = jnp.asarray([100.0, -305.6, 4.0, 0.05], f32)

obs_xy = jnp.asarray([[112.0, -305.5], [125.0, -304.6]], f32)
obs_size = jnp.asarray([[3.63, 1.84]] * 2, f32)
obs_yaw = jnp.asarray([0.0, 0.3], f32)
obs_mask = jnp.asarray([1.0, 1.0], f32)
ob = obs_mod.make_static_obstacles(p, obs_xy, obs_size, obs_yaw, dtype=f32)

cm_fn = jax.jit(lambda e: costmap.build_local_costmap(
    cp, jnp.asarray(gm, f32), ggeom, plan[:, :2], n, e,
    obs_xy, obs_size, obs_yaw, obs_mask, use_pallas=True))
lc = cm_fn(ego)
jax.block_until_ready(lc)
u = np.asarray(lc.uncertainty_map)
print("uncertainty range:", u.min(), u.max(), "finite:", np.isfinite(u).all())
assert 0.0 <= u.min() and u.max() <= 100.0 and np.isfinite(u).all()

unc = UncertaintyMap(lc.uncertainty_map, lc.geom, lc.origin_xy, lc.origin_yaw)
U = solver.initial_controls(p, dtype=f32)
t0 = time.perf_counter()
res = solver.run_step_jit(p, plan, n, ego, U, ob, unc)
jax.block_until_ready(res)
print(f"solve 1 (compile): {time.perf_counter()-t0:.1f}s iters={int(res.iterations)}")
assert 1 <= int(res.iterations) <= 20
assert np.isfinite(np.asarray(res.X)).all() and np.isfinite(np.asarray(res.U)).all()

# receding-horizon warm start: step ego along, rebuild costmap, re-solve cached
ego2 = res.X[1]
lc2 = cm_fn(ego2)
unc2 = UncertaintyMap(lc2.uncertainty_map, lc2.geom, lc2.origin_xy, lc2.origin_yaw)
t0 = time.perf_counter()
res2 = solver.run_step_jit(p, plan, n, ego2, res.U, ob, unc2)
jax.block_until_ready(res2)
dt = time.perf_counter() - t0
print(f"solve 2 (cached): {dt*1e3:.1f} ms iters={int(res2.iterations)}")
assert dt < 0.1, dt
assert np.isfinite(np.asarray(res2.U)).all()

# probe: ego far outside the costmap -> uncertainty term silent zero
ego_far = jnp.asarray([500.0, 500.0, 4.0, 0.0], f32)
ra = solver.run_step_jit(p, plan, n, ego_far, U, ob, unc)
rb = solver.run_step_jit(p, plan, n, ego_far, U, ob, None)
jax.block_until_ready((ra, rb))
du = float(jnp.max(jnp.abs(ra.U - rb.U)))
print("outside-map solve delta (with vs without unc):", du)
assert du == 0.0, du

# probe: zero-speed ego (state-dependent yaw-rate bound collapses)
ego0 = jnp.asarray([100.0, -305.6, 0.0, 0.05], f32)
r0 = solver.run_step_jit(p, plan, n, ego0, U, ob, unc)
jax.block_until_ready(r0)
assert np.isfinite(np.asarray(r0.U)).all()
print("zero-speed solve OK, iters =", int(r0.iterations))

# probe: obstacles with mask=0 match no-obstacle solve
ob0 = obs_mod.make_static_obstacles(p, obs_xy, obs_size, obs_yaw, dtype=f32)
ob0 = ob0._replace(mask=jnp.zeros_like(ob0.mask))
rm = solver.run_step_jit(p, plan, n, ego, U, ob0, None)
rn = solver.run_step_jit(p, plan, n, ego, U, None, None)
jax.block_until_ready((rm, rn))
dm = float(jnp.max(jnp.abs(rm.U - rn.U)))
print("masked-obstacle delta:", dm)
assert dm == 0.0, dm

# full-stack batched closed loop (per-scenario costmaps + hybrid mega solve
# + banded propagation + Pallas prior resample), small shapes
from cilqr_tpu.ops import uncertainty_pallas
from cilqr_tpu.sim import plant
from cilqr_tpu.utils.params import NoiseParams

xr, yr = costmap.corridor_center_bounds(cp, plan[:, :2], n)
band = uncertainty_pallas.make_band_plan_bounds(
    cp, cp.rows, cp.cols, xr, yr, (cp.sigma_x, cp.sigma_y, cp.sigma_theta))
Bfs = 256
rng = np.random.default_rng(0)
x0s = jnp.asarray(np.asarray(ego)[None, :] + rng.normal(0, 0.3, (Bfs, 4)), f32)
fs = jax.jit(lambda x, k: plant.closed_loop_full_stack_batched(
    p, cp, NoiseParams(), jnp.asarray(gm, f32), ggeom, plan[:, :2], n, x, k, 2,
    obstacles=ob, band_plan=band, global_res=0.5))
t0 = time.perf_counter()
xf, recs = fs(x0s, jax.random.key(0))
jax.block_until_ready(xf)
print(f"full-stack batched (B={Bfs}, 2 cycles): {time.perf_counter()-t0:.1f}s "
      f"umax={float(jnp.max(recs['uncertainty_max'])):.1f}")
assert np.isfinite(np.asarray(xf)).all()
assert 0.0 <= float(jnp.max(recs["uncertainty_max"])) <= 100.0

# chip-tier bit-identity: the aligned-group dynamic-row propagation mode
# (Mosaic pl.multiple_of dynamic sublane starts on rank-3 refs) vs the
# static unroll, COMPILED on the real chip — interpret-mode coverage alone
# cannot catch Mosaic lowering regressions (advisor r3)
balign = 64
geomB_a = jax.tree.map(
    lambda a: jnp.broadcast_to(a, (balign,) + a.shape),
    gridmap.make_geom((cp.x_position, cp.y_position), cp.resolution,
                      cp.rows, cp.cols, dtype=f32))
pri_a = jnp.asarray(np.random.default_rng(7).uniform(0, 100, (balign, cp.rows, cp.cols)), f32)
yaws_a = jnp.linspace(-3.0, 3.0, balign).astype(f32)
sig_a = jnp.broadcast_to(jnp.asarray([0.16, 0.16, 0.017], f32), (balign, 3))
bp_small = uncertainty_pallas.make_band_plan(
    cp, cp.rows, cp.cols, (cp.x_position, cp.y_position), (0.16, 0.16, 0.017))
out_unroll = jax.jit(lambda pr: uncertainty_pallas.propagate_uncertainty_tpu_banded(
    cp, pr, geomB_a, yaws_a, sig_a, bp_small, unroll_rows=True))(pri_a)
out_align = jax.jit(lambda pr: uncertainty_pallas.propagate_uncertainty_tpu_banded(
    cp, pr, geomB_a, yaws_a, sig_a, bp_small, unroll_rows="aligned"))(pri_a)
np.testing.assert_array_equal(np.asarray(out_unroll), np.asarray(out_align))
print("aligned-group row loop == static unroll: bit-identical on chip")

# Monte-Carlo fast path (per-scenario sampled covariances)
from cilqr_tpu.parallel import monte_carlo as mc_mod

sigma_hi = (0.16, 0.16, 0.017)
center = (cp.x_position, cp.y_position)
cpm = mc_mod.ensure_window_covers(cp, cp.rows, cp.cols, center, sigma_hi)
mc_band = uncertainty_pallas.make_band_plan(cpm, cpm.rows, cpm.cols, center, sigma_hi)
mc_prior = jnp.asarray(rng.uniform(0, 100, (cpm.rows, cpm.cols)), f32)
mc_geom = gridmap.make_geom(center, cpm.resolution, cpm.rows, cpm.cols, dtype=f32)
ego_np = np.asarray(ego)
samp = mc_mod.sample_scenarios(jax.random.key(1), 256, ego_np,
                               sigma_hi=sigma_hi, dtype=f32)
mc_xy = jnp.asarray(ego_np[:2], f32)
mc_yaw = jnp.asarray(ego_np[3], f32)
mc = jax.jit(lambda sg, eg: mc_mod.monte_carlo(
    p, cpm, mc_prior, mc_geom, mc_xy, mc_yaw, plan, n,
    mc_mod.MCSample(sg, eg), ob,
    sigma_hi=sigma_hi, impl="fast", band_plan=mc_band))
t0 = time.perf_counter()
out = mc(samp.sigmas, samp.egos)
jax.block_until_ready(out)
print(f"monte-carlo fast path (B=256): {time.perf_counter()-t0:.1f}s")
print("E2E DRIVE OK")
