"""Experiment metrics — the offline rosbag/pandas/Excel pipeline, jitted.

Reference semantics: ``CILQR/src/ilqr/src/dataprocess.py`` (per-run metrics)
and ``batch_dataprocess.py`` (multi-run batches per algorithm).  Instead of
bag files the input is the ``ExperimentRecord`` pytree streamed out of the
closed-loop plant; the reductions are pure jnp so per-scenario metrics fold
into mesh-wide ``psum``s for pod-scale Monte-Carlo runs.
"""

from __future__ import annotations

import json
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Stats(NamedTuple):
    min: jax.Array
    max: jax.Array
    mean: jax.Array
    var: jax.Array  # population variance (ddof=0, dataprocess.py:193)


def _stats(x: jax.Array) -> Stats:
    return Stats(jnp.min(x), jnp.max(x), jnp.mean(x), jnp.var(x))


def spatial_window_mask(positions: jax.Array, start_pos, end_pos,
                        planning_time: Optional[jax.Array] = None,
                        planning_time_threshold: float = 0.0) -> jax.Array:
    """Row filter of ``data_process`` (dataprocess.py:72-95): keep cycles
    whose start position lies in the rectangle spanned by start/end, with an
    optional planning-time floor."""
    lo = jnp.minimum(jnp.asarray(start_pos), jnp.asarray(end_pos))
    hi = jnp.maximum(jnp.asarray(start_pos), jnp.asarray(end_pos))
    m = jnp.all((positions[:, :2] >= lo) & (positions[:, :2] <= hi), axis=1)
    if planning_time is not None:
        m = m & (planning_time > planning_time_threshold)
    return m


def compute_jerks(xy: jax.Array, dt: float) -> jax.Array:
    """|jerk| along a (T, 2) trajectory via three nested gradients
    (dataprocess.py:117-150)."""
    v = jnp.gradient(xy, dt, axis=0)
    a = jnp.gradient(v, dt, axis=0)
    j = jnp.gradient(a, dt, axis=0)
    return jnp.sqrt(jnp.sum(j * j, axis=1))


def compute_curvature(xy: jax.Array) -> jax.Array:
    """Unsigned curvature of a (T, 2) trajectory (dataprocess.py:153-181);
    zero where the speed denominator vanishes."""
    d = jnp.gradient(xy, axis=0)
    dd = jnp.gradient(d, axis=0)
    num = jnp.abs(d[:, 0] * dd[:, 1] - d[:, 1] * dd[:, 0])
    den = (d[:, 0] ** 2 + d[:, 1] ** 2) ** 1.5
    return jnp.where(den == 0, 0.0, num / den)


def min_obstacle_distance(positions: jax.Array, obs_xy: jax.Array,
                          obs_mask: Optional[jax.Array] = None) -> jax.Array:
    """(T,) per-cycle min center distance to any obstacle
    (``calculate_distance``, dataprocess.py:97-115 — deliberately
    center-to-center, not footprint clearance)."""
    d = jnp.sqrt(
        jnp.sum((positions[:, None, :2] - obs_xy[None, :, :2]) ** 2, axis=-1)
    )  # (T, M)
    if obs_mask is not None:
        d = jnp.where(obs_mask[None, :] > 0, d, jnp.inf)
    return jnp.min(d, axis=1)


def analyze_run(
    start_pos: jax.Array,            # (T, 4) per-cycle ego state
    obs_xy: jax.Array,               # (M, 2)
    dt: float = 0.1,
    planning_time: Optional[jax.Array] = None,
    obs_mask: Optional[jax.Array] = None,
    window=None,                     # ((x0,y0),(x1,y1)) spatial filter
    planning_time_threshold: float = 0.0,
) -> Dict[str, Stats | jax.Array]:
    """``data_analysis`` (dataprocess.py:185-277): planning-time stats,
    min obstacle distance, mean jerk, curvature stats, velocity stats.

    ``window`` applies the reference's row filter *before* the reductions
    (``data_process``, dataprocess.py:72-95; windows per scenario in
    ``sim.scenarios.EVAL_WINDOWS``) — the gradients then run over the
    filtered sequence exactly as the pandas pipeline does.  Host-side
    filtering (dynamic shape): don't call with a window under jit; the
    jittable full-run form is what ``analyze_batch`` vmaps.
    """
    if window is not None:
        m = np.asarray(
            spatial_window_mask(
                jnp.asarray(start_pos), window[0], window[1],
                planning_time=None if planning_time is None else jnp.asarray(planning_time),
                planning_time_threshold=planning_time_threshold,
            )
        )
        start_pos = jnp.asarray(np.asarray(start_pos)[m])
        if planning_time is not None:
            planning_time = jnp.asarray(np.asarray(planning_time)[m])
    if start_pos.shape[0] < 3:
        # the jerk/curvature gradients need >= 3 rows (the reference prints
        # the same complaint, dataprocess.py:131-133/158-159)
        raise ValueError(
            f"only {start_pos.shape[0]} cycles in the evaluation window — "
            "need at least 3 for jerk/curvature"
        )
    xy = start_pos[:, :2]
    dists = min_obstacle_distance(start_pos, obs_xy, obs_mask)
    curv = compute_curvature(xy)
    out: Dict[str, Stats | jax.Array] = {
        "distance_to_obstacles": _stats(dists),
        "mean_jerk": jnp.mean(compute_jerks(xy, dt)),
        "curvature": _stats(curv),
        "velocity": _stats(start_pos[:, 2]),
    }
    if planning_time is not None:
        out["planning_time"] = _stats(planning_time)
    return out


def analyze_batch(start_pos_batch: jax.Array, obs_xy, dt: float = 0.1,
                  obs_mask=None) -> Dict[str, np.ndarray]:
    """Per-run metrics over a (R, T, 4) batch of runs, vmapped — the
    10-bag-per-algorithm loop of ``process_multiple_bags``
    (batch_dataprocess.py:386-447) as one device program."""
    fn = lambda sp: analyze_run(sp, obs_xy, dt, obs_mask=obs_mask)
    res = jax.vmap(fn)(start_pos_batch)
    return jax.tree.map(np.asarray, res)


def summary_row(name: str, metrics: Dict) -> Dict[str, float]:
    """Flatten one run's metrics into a row (the Excel-sheet row analog)."""
    row: Dict[str, float] = {"run": name}
    for k, v in metrics.items():
        if isinstance(v, Stats):
            for f in Stats._fields:
                row[f"{k}_{f}"] = float(np.asarray(getattr(v, f)))
        else:
            row[k] = float(np.asarray(v))
    return row


def export_csv(rows, path: str) -> None:
    """CSV export replacing the Excel writer (dataprocess.py:330-334)."""
    if not rows:
        raise ValueError("no rows")
    keys = list(rows[0].keys())
    with open(path, "w") as f:
        f.write(",".join(keys) + "\n")
        for r in rows:
            f.write(",".join(str(r.get(k, "")) for k in keys) + "\n")


def export_jsonl(rows, path: str) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def compare_algorithms(runs_by_algorithm: Dict[str, jax.Array], obs_xy,
                       dt: float = 0.1, obs_mask=None):
    """Multi-algorithm comparison table — the CCNMPC/CILQR/CILQR_Base/
    Frenet/NRB-RRT sweep of ``batch_dataprocess.py:459-475`` (10 bags per
    algorithm -> one summary sheet each).

    Args:
      runs_by_algorithm: name -> (R, T, 4) stacked per-run start positions.
    Returns:
      list of flat rows (one per run) + per-algorithm aggregate rows, ready
      for ``export_csv``.
    """
    rows = []
    for name, batch in runs_by_algorithm.items():
        per_run = analyze_batch(jnp.asarray(batch), obs_xy, dt, obs_mask=obs_mask)
        R = batch.shape[0]
        for r in range(R):
            one = jax.tree.map(lambda a, r=r: a[r], per_run)
            rows.append(summary_row(f"{name}/{r}", one))
        agg = jax.tree.map(lambda a: np.mean(np.asarray(a)), per_run)
        row = summary_row(f"{name}/mean", agg)
        rows.append(row)
    return rows
