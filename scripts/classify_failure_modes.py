"""Per-object (car vs wall) SAT classification of n=50 reference-ratio failures.

Reruns the aware (cilqr) sweep cells at the reference noise ratio
(0.017/0.16, production geometry, n=50, seed 0 — the docs/sweep_r4_n50
configuration) at w_uncertainty 5 (the Experiment.launch:11 value) and 1,
then attributes every collided run to the first object class its recorded
pose SAT-hits (wall vs parked car).  Backs the BASELINES.md mechanism
paragraph: the aware planner's excess high-sigma failures at this ratio
are hits on the WALL it can see (near-isotropic corridor flooding), and
w_uncertainty=1 restores exactly the blind collision count.

Run on the real chip: PYTHONPATH=/root/repo python scripts/classify_failure_modes.py
(~10 min, two compiles).  Ego W here uses the SAT ground truth's 2.16.
"""
import dataclasses, numpy as np, jax, jax.numpy as jnp
from cilqr_tpu.sim import scenarios, sweep
from cilqr_tpu.ops import gridmap
from cilqr_tpu.utils import maps
from cilqr_tpu.utils.params import CostmapParams, SolverParams
from cilqr_tpu.models import reference_path as rp
import tempfile

def np_sat(ego, obs):  # ego (x,y,yaw,L,W), obs same
    def corners(x, y, yaw, L, W):
        hl, hw = L/2, W/2
        loc = np.array([[-hl,-hw],[hl,-hw],[hl,hw],[-hl,hw]])
        c, s = np.cos(yaw), np.sin(yaw)
        return np.stack([loc[:,0]*c - loc[:,1]*s + x, loc[:,0]*s + loc[:,1]*c + y], -1)
    c1, c2 = corners(*ego), corners(*obs)
    axes = []
    for c in (c1, c2):
        for i, j in ((0,1),(0,3)):
            a = np.arctan2(c[j,1]-c[i,1], c[j,0]-c[i,0]); axes.append(a)
    for a in axes:
        ca, sa = np.cos(a), np.sin(a)
        p1 = c1[:,0]*ca + c1[:,1]*sa; p2 = c2[:,0]*ca + c2[:,1]*sa
        if p1.max() < p2.min() or p2.max() < p1.min():
            return False
    return True

sc = scenarios.make_gauntlet()
cp = CostmapParams()
yaml = maps.make_synthetic_town(tempfile.mkdtemp(prefix="cls_town_"))
occ, info = maps.load_map(yaml)
arr, center = maps.to_gridmap_array(occ, info, unknown_value=100.0)
gm = jnp.asarray(arr, jnp.float32)
gg = gridmap.make_geom(center, info.resolution, arr.shape[0], arr.shape[1], dtype=jnp.float32)
plan = scenarios.plan_for("compare")
x0 = np.array(sc.start)
ratio = 0.017/0.16
cp_max = sweep.matched_costmap_params(cp, 0.5, 0.5*ratio)

cars = np.asarray(sc.obstacles_xyyaw, np.float64)
car_L, car_W = float(sc.obstacle_size[0]), float(sc.obstacle_size[1])
walls = np.asarray(sc.walls_xyyaw, np.float64)
wall_L, wall_W = [float(v) for v in np.asarray(sc.wall_size)]

for tag, w_unc in (("w5", 5.0), ("w1", 1.0)):
    p = dataclasses.replace(SolverParams(), horizon=40, w_uncertainty=w_unc)
    planj, n = rp.pad_global_plan(p, np.asarray(plan), dtype=jnp.float32)
    fn = sweep.make_cell_fn("cilqr", p, cp_max, sc, planj, n, x0, 160, 50,
                            gm, gg, False, jnp.float32)
    for s in (0.375, 0.5):
        _, rec = fn(jnp.asarray(s, jnp.float32), jnp.asarray(s*ratio, jnp.float32), jax.random.key(0))
        rec = {k: np.asarray(v) for k, v in (rec.items() if isinstance(rec, dict) else rec._asdict().items())}
        coll = rec["collided"].sum(axis=-1) > 0
        sp = np.asarray(rec["start_pos"], np.float64)  # (runs, T, 4)
        pL, pW = 4.79, 2.16  # SolverParams length/width (SAT ground truth)
        nw = nc = 0
        for r in np.where(coll)[0]:
            wall_hit = car_hit = False
            for t in range(sp.shape[1]):
                ego = (sp[r,t,0], sp[r,t,1], sp[r,t,3], pL, pW)
                if not wall_hit:
                    wall_hit = any(np_sat(ego, (w[0], w[1], w[2], wall_L, wall_W)) for w in walls)
                if not car_hit:
                    car_hit = any(np_sat(ego, (o[0], o[1], o[2], car_L, car_W)) for o in cars)
                if wall_hit and car_hit: break
            nw += wall_hit; nc += car_hit
        print(f"cilqr {tag} s={s}: collided={int(coll.sum())}/50 wall_hits={nw} car_hits={nc}", flush=True)
