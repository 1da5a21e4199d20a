"""Global <-> vehicle frame path transforms.

Reference semantics: ``ilqr_uncertainty_node.cpp:286-313``
(``pathInGlobal2Vechicle`` / ``pathInVechicle2Global``).

NOTE (reference quirk): the C++ pair is *not* a mutually-inverse rotation —
both directions use ``sin*dx - cos*dy`` / ``x*sin - y*cos`` for the y
component, i.e. each applies a reflection across the heading axis (the pair
composes to identity only because the reflection is involutive).  The
faithful functions reproduce that; the ``*_rot`` variants are the proper
rotations used elsewhere in this framework (e.g. ops/costmap.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split(ego_state):
    c = jnp.cos(ego_state[3])
    s = jnp.sin(ego_state[3])
    return ego_state[0], ego_state[1], c, s


def global_to_vehicle(path_xy: jax.Array, ego_state: jax.Array) -> jax.Array:
    """Faithful pathInGlobal2Vechicle (ilqr_uncertainty_node.cpp:286-299):
    x' = dx cos + dy sin;  y' = dx sin - dy cos  (reflected!)."""
    ex, ey, c, s = _split(ego_state)
    dx = path_xy[..., 0] - ex
    dy = path_xy[..., 1] - ey
    return jnp.stack([dx * c + dy * s, dx * s - dy * c], axis=-1)


def vehicle_to_global(path_xy: jax.Array, ego_state: jax.Array) -> jax.Array:
    """Faithful pathInVechicle2Global (ilqr_uncertainty_node.cpp:301-313):
    x = ex + x' cos + y' sin;  y = ey + x' sin - y' cos  (reflected!)."""
    ex, ey, c, s = _split(ego_state)
    px = path_xy[..., 0]
    py = path_xy[..., 1]
    return jnp.stack([ex + px * c + py * s, ey + px * s - py * c], axis=-1)


def global_to_vehicle_rot(path_xy: jax.Array, ego_state: jax.Array) -> jax.Array:
    """Proper rotation into the vehicle frame (no reflection)."""
    ex, ey, c, s = _split(ego_state)
    dx = path_xy[..., 0] - ex
    dy = path_xy[..., 1] - ey
    return jnp.stack([dx * c + dy * s, -dx * s + dy * c], axis=-1)


def vehicle_to_global_rot(path_xy: jax.Array, ego_state: jax.Array) -> jax.Array:
    """Proper rotation back to the global frame (inverse of the above)."""
    ex, ey, c, s = _split(ego_state)
    px = path_xy[..., 0]
    py = path_xy[..., 1]
    return jnp.stack([ex + px * c - py * s, ey + px * s + py * c], axis=-1)
