"""Ghost-cell halo exchange over the device mesh.

TPU-native replacement of the reference's DMDA ``globalToLocal`` BOX-stencil
scatter (src/petclaw/state.py — get_qbc_from_q; SURVEY.md §2.6, §5.7):

  - per spatial dim: 2 ``lax.ppermute`` ring shifts (low face up, high face
    down) — nearest-neighbor traffic that maps directly onto the ICI torus;
  - axes processed sequentially on the already-extended array, so corner
    ghosts (needed by transverse/CTU terms) are filled exactly like DMDA's
    BOX stencil;
  - periodic global BCs are free (the ring wrap IS the periodic copy);
  - physical BCs (extrap/wall) are computed locally by every shard but
    *selected* only on boundary-owning shards via ``lax.axis_index``
    masking — the analog of petclaw/geometry.py ownership flags.

Must be called inside ``shard_map``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..bc import BC, _ghost_slices


def _take(q, axis, sl):
    idx = [slice(None)] * q.ndim
    idx[axis] = sl
    return q[tuple(idx)]


def extend_serial_only(q, num_ghost, bc_lower, bc_upper, axis_names,
                       wall_reflects=True):
    """Extend ONLY the unsharded axes (serial physical BCs); sharded axes
    are left raw.  This is the comm-free input of the interior piece in
    the overlapped step (parallel/solver.py): its ghost data is entirely
    local, so XLA can schedule the big interior kernel before/while the
    face ppermutes are in flight."""
    g = num_ghost
    num_dim = q.ndim - 1
    for d in range(num_dim):
        name = axis_names[d] if d < len(axis_names) else None
        if name is not None:
            continue
        axis = 1 + d
        normal = (1 + d) if wall_reflects else None
        lo = _ghost_slices(q, axis, g, bc_lower[d], 0, normal)
        hi = _ghost_slices(q, axis, g, bc_upper[d], 1, normal)
        q = jnp.concatenate([lo, q, hi], axis=axis)
    return q


def extend_local(q, num_ghost, bc_lower, bc_upper, axis_names,
                 wall_reflects=True):
    """Extend a local block with ghost cells on every spatial axis.

    q: (num_eqn, *local_cells) inside shard_map.  axis_names: per spatial
    dim the mesh axis name it is sharded over (or None for unsharded dims,
    which fall back to the serial BC path).
    """
    g = num_ghost
    num_dim = q.ndim - 1
    for d in range(num_dim):
        axis = 1 + d
        name = axis_names[d] if d < len(axis_names) else None
        normal = (1 + d) if wall_reflects else None
        n = q.shape[axis]

        if name is None:
            # unsharded dim: serial BC extension
            lo = _ghost_slices(q, axis, g, bc_lower[d], 0, normal)
            hi = _ghost_slices(q, axis, g, bc_upper[d], 1, normal)
        else:
            m = lax.axis_size(name)
            idx = lax.axis_index(name)
            lo_face = _take(q, axis, slice(0, g))
            hi_face = _take(q, axis, slice(n - g, n))
            # from_left: my low ghost band = left neighbor's high face
            from_left = lax.ppermute(hi_face, name,
                                     [(i, (i + 1) % m) for i in range(m)])
            from_right = lax.ppermute(lo_face, name,
                                      [(i, (i - 1) % m) for i in range(m)])
            if bc_lower[d] == BC.periodic:
                lo = from_left
            else:
                kind = bc_lower[d] if bc_lower[d] != BC.custom else BC.extrap
                phys_lo = _ghost_slices(q, axis, g, kind, 0, normal)
                lo = jnp.where(idx == 0, phys_lo, from_left)
            if bc_upper[d] == BC.periodic:
                hi = from_right
            else:
                kind = bc_upper[d] if bc_upper[d] != BC.custom else BC.extrap
                phys_hi = _ghost_slices(q, axis, g, kind, 1, normal)
                hi = jnp.where(idx == m - 1, phys_hi, from_right)
        q = jnp.concatenate([lo, q, hi], axis=axis)
    return q
