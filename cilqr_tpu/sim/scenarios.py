"""Scripted experiment scenarios — the CARLA spawn tables, CARLA-free.

Obstacle poses come from the reference's two sources, reconciled to the
planner's map frame: y is negated relative to the CARLA spawn tables while
the yaw values are carried over unchanged (in radians) — exactly the
``dataprocess.py:290-304`` obstacle table vs the spawns at
``vehiclepub/scripts/main.py:142-171``:

  * ``long``:      9 obstacles along the Town02 loop (main.py:142-157)
  * ``compare``:   1 obstacle (main.py:158-159)
  * ``success1-3``: 3-obstacle slalom variants (main.py:160-171)

Obstacle footprint 3.63 x 1.84 m (the Nissan blueprint's bbox recorded in
``dataprocess.py:290-304``).  The four spatial evaluation windows mirror
``dataprocess.py:311-322``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

OBSTACLE_LENGTH = 3.63
OBSTACLE_WIDTH = 1.84

# (x, y, yaw) in the planner map frame (y = -y_carla, yaw = -yaw_carla)
_SCENARIOS: Dict[str, List[Tuple[float, float, float]]] = {
    "long": [
        (123.32, -306.74, 0.0),
        (103.32, -306.74, 0.0),
        (193.9, -230.74, -np.pi / 2.0),
        (190.5, -190.74, np.pi * 4.0 / 3.0),
        (189.6, -210.74, np.pi / 2.0),
        (189.2, -111.6, np.pi * 230.0 / 180.0),
        (123.4, -105.0, np.pi),
        (103.4, -105.0, np.pi),
        (83.4, -105.0, np.pi),
    ],
    "compare": [
        (72.32, -306.74, 0.0),
    ],
    "success1": [
        (93.32, -305.74, 0.0),
        (108.32, -303.74, 0.0),
        (123.32, -305.74, 0.0),
    ],
    "success2": [
        (88.32, -305.74, 0.0),
        (108.32, -303.74, 0.0),
        (128.32, -305.74, 0.0),
    ],
    "success3": [
        (93.32, -305.99, 0.0),
        (108.32, -303.49, 0.0),
        (123.32, -305.99, 0.0),
    ],
}

# Evaluation windows ((start_xy), (end_xy)) — dataprocess.py:311-322
EVAL_WINDOWS = {
    1: ((113.0, -310.0), (133.0, -300.0)),
    2: ((179.0, -240.0), (203.0, -180.0)),
    3: ((179.0, -121.0), (199.0, -101.0)),
    4: ((73.0, -115.0), (133.0, -95.0)),
}


@dataclasses.dataclass(frozen=True)
class Scenario:
    name: str
    obstacles_xyyaw: np.ndarray  # (M, 3)
    obstacle_size: Tuple[float, float] = (OBSTACLE_LENGTH, OBSTACLE_WIDTH)

    @property
    def n_obstacles(self) -> int:
        return self.obstacles_xyyaw.shape[0]


def get_scenario(name: str) -> Scenario:
    if name not in _SCENARIOS:
        raise KeyError(f"unknown scenario {name!r}; have {sorted(_SCENARIOS)}")
    return Scenario(name, np.asarray(_SCENARIOS[name], dtype=np.float64))


def scenario_names() -> List[str]:
    return sorted(_SCENARIOS)


def straight_lane_plan(x0=60.0, y=-306.74, length=150.0, spacing=1.0) -> np.ndarray:
    """(n, 2) straight global plan along the ``long``/``compare`` first leg."""
    n = int(length / spacing) + 1
    xs = x0 + spacing * np.arange(n)
    return np.stack([xs, np.full(n, y)], axis=1)
