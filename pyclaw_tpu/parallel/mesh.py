"""Device-mesh construction for domain decomposition.

Replaces reference PETSc ``DMDA.create`` topology setup
(src/petclaw/state.py :~; SURVEY.md §2.6): grid dimensions map onto mesh
axes named after the spatial dims ('x','y','z'), so a 2D problem on 8
devices gets a (4, 2) torus whose neighbor exchanges ride the ICI links.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_NAMES = ("x", "y", "z")


def _factor(n, num_dim):
    """Split n devices into num_dim near-square factors (largest first)."""
    if num_dim == 1:
        return [n]
    best = None
    if num_dim == 2:
        for a in range(1, n + 1):
            if n % a == 0:
                b = n // a
                score = abs(a - b)
                if best is None or score < best[0]:
                    best = (score, [a, b])
        return best[1]
    # 3D: greedy cube-ish factorization
    a = round(n ** (1 / 3))
    while a > 1 and n % a != 0:
        a -= 1
    rest = _factor(n // a, 2)
    return sorted([a] + rest, reverse=True)


def make_mesh(num_dim, mesh_shape=None, devices=None):
    """Build a Mesh whose axes are named after grid dimensions."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = _factor(n, num_dim)
    if math.prod(mesh_shape) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    if len(mesh_shape) != num_dim:
        raise ValueError("mesh_shape length must equal num_dim")
    dev_array = np.array(devices).reshape(mesh_shape)
    return Mesh(dev_array, AXIS_NAMES[:num_dim])
