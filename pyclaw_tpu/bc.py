"""Boundary conditions: functional ghost-cell extension.

Rebuild of reference ``src/pyclaw/solver.py — BC enum + Solver._apply_bcs /
_bc_lower / _bc_upper`` (:~400-600; SURVEY.md §2.1).  The reference fills a
preallocated ghost-padded workspace ``qbc`` with array copies; here
``extend()`` is a *pure function* traced under jit: it concatenates ghost
slices onto ``q`` one dimension at a time (x, then y, then z), so corner
ghosts are consistent — the same sequential-axis ordering DMDA's BOX stencil
provides in PetClaw.

BC kinds (same numeric ids as the reference):
  custom=0   user callback fills the ghost band
  extrap=1   zero-order extrapolation (edge replication)
  periodic=2 wrap-around
  wall=3     solid wall: mirror cells and negate the normal-momentum
             component (component ``1+idim`` by convention — correct for
             acoustics/Euler/SWE layouts; reference solver.py :~560)

Custom callbacks are jax-traceable functions with signature
``fn(state, dim_index, t, qbc, auxbc, num_ghost) -> qbc`` returning the
updated array (functional analog of the reference's in-place mutation).

On a sharded axis the periodic wrap is handled by the halo exchange ring
(pyclaw_tpu.parallel.halo) and physical BCs are masked to boundary-owning
shards — see parallel/halo.py.
"""

from __future__ import annotations

import jax.numpy as jnp


class BC:
    """Boundary-condition ids (reference solver.py — class BC)."""
    custom = 0
    extrap = 1
    periodic = 2
    wall = 3


def _ghost_slices(q, axis, num_ghost, kind, side, normal_comp):
    """Build the ghost band for one side of one axis.

    side: 0 = lower, 1 = upper.  Returns array with num_ghost entries along
    `axis`.  `normal_comp` is the q-component to negate for wall BCs (or
    None for scalar systems / aux arrays).
    """
    g = num_ghost
    n = q.shape[axis]

    def take(sl):
        idx = [slice(None)] * q.ndim
        idx[axis] = sl
        return q[tuple(idx)]

    if kind == BC.periodic:
        return take(slice(n - g, n)) if side == 0 else take(slice(0, g))
    elif kind in (BC.extrap, BC.custom):
        # custom: placeholder (edge replication); the user callback
        # overwrites the band afterwards.
        edge = take(slice(0, 1)) if side == 0 else take(slice(n - 1, n))
        reps = [1] * q.ndim
        reps[axis] = g
        return jnp.tile(edge, reps)
    elif kind == BC.wall:
        band = take(slice(0, g)) if side == 0 else take(slice(n - g, n))
        band = jnp.flip(band, axis=axis)
        if normal_comp is not None and q.shape[0] > normal_comp:
            sign = jnp.ones((q.shape[0],) + (1,) * (q.ndim - 1), dtype=q.dtype)
            sign = sign.at[normal_comp].set(-1.0)
            band = band * sign
        return band
    else:
        raise ValueError(f"unknown BC kind {kind}")


def extend_aligned(q, num_ghost, bc_lower, bc_upper, wall_reflects=True,
                   tail=(0, 0)):
    """2D ghost extension fused with the Pallas DMA-alignment tail.

    The row-tiled Pallas kernels need qbc padded to 8-aligned rows /
    128-aligned lanes; done separately (extend() + jnp.pad) that is two
    extra full-array output passes per kernel invocation.  For UNIFORM
    extrap or periodic BCs the whole thing is one ``jnp.pad`` with
    mode='edge'/'wrap' — identical ghost values to extend(), and the
    tail cells hold replicated/wrapped REAL data (finite — the kernels
    clip them out of the interior window and CFL reduction via
    ``cfl_shape``).  Returns None for any other BC combination (mixed
    kinds, wall, custom) — callers fall back to extend() + in-kernel
    padding.  (A dynamic-update-slice single-pass variant supporting
    all BC kinds was measured 0.3 ms/call SLOWER at 1024^2 — XLA does
    not elide the DUS copies — and dropped; docs/performance.md.)"""
    g = num_ghost
    num_dim = q.ndim - 1
    kinds = set(tuple(bc_lower[:num_dim]) + tuple(bc_upper[:num_dim]))
    widths = ((0, 0),) + tuple((g, g + t) for t in tail)
    if kinds == {BC.extrap}:
        return jnp.pad(q, widths, mode="edge")
    if kinds == {BC.periodic}:
        return jnp.pad(q, widths, mode="wrap")
    return None


def extend(q, num_ghost, bc_lower, bc_upper, wall_reflects=True):
    """Extend q with ghost cells on every spatial axis.

    q: (num_eqn|num_aux, *cells).  bc_lower/bc_upper: per-dimension BC ids.
    wall_reflects: negate normal momentum (True for q, False for aux).
    Returns qbc with every spatial axis grown by 2*num_ghost.
    """
    num_dim = q.ndim - 1
    for d in range(num_dim):
        axis = 1 + d
        normal = (1 + d) if wall_reflects else None
        lo = _ghost_slices(q, axis, num_ghost, bc_lower[d], 0, normal)
        hi = _ghost_slices(q, axis, num_ghost, bc_upper[d], 1, normal)
        q = jnp.concatenate([lo, q, hi], axis=axis)
    return q
