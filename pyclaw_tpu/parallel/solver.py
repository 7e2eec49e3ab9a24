"""Distributed solver classes (PetClaw solver shims equivalent —
src/petclaw/solver.py :~1-60, but here the subclasses swap the two comm
seams instead of the data-model classes):

  - ``_extend_bc``   -> ppermute halo exchange (halo.extend_local)
  - ``_finalize_step`` -> shard_map over the mesh + pmax CFL reduction

Everything else — kernels, evolve loop, controller — is byte-identical to
the serial path, mirroring the reference's "solver code never changes"
property (SURVEY.md §1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .. import classic, sharpclaw
from ..bc import BC
from . import halo
from .mesh import AXIS_NAMES, make_mesh


class _DistributedMixin:
    """Mixin carrying the mesh + the two distributed seams."""

    def __init__(self, riemann_solver=None, mesh=None):
        super().__init__(riemann_solver)
        self.mesh = mesh

    # -- seam 1: halo exchange (replaces serial BC extension) ----------
    def _extend_bc(self, q, aux, t, state):
        g = self.num_ghost
        names = self._axis_names
        if any(bc == BC.custom for bc in
               list(self.bc_lower) + list(self.bc_upper)):
            raise NotImplementedError(
                "custom BCs in distributed mode not yet supported")
        qbc = halo.extend_local(q, g, self.bc_lower, self.bc_upper, names,
                                wall_reflects=True)
        auxbc = None
        if aux is not None:
            auxbc = halo.extend_local(aux, g, self.aux_bc_lower,
                                      self.aux_bc_upper, names,
                                      wall_reflects=False)
        return qbc, auxbc

    # -- seam 2: shard_map + CFL reduction -----------------------------
    def _finalize_step(self, step_fn, state):
        if self.mesh is None:
            self.mesh = make_mesh(self.num_dim)
        mesh = self.mesh
        # spatial dim d is sharded over mesh axis named AXIS_NAMES[d]
        names = tuple(
            AXIS_NAMES[d] if AXIS_NAMES[d] in mesh.axis_names else None
            for d in range(self.num_dim))
        self._axis_names = names

        shape = dict(zip(mesh.axis_names, mesh.devices.shape))
        for d, nm in enumerate(names):
            if nm is None:
                continue
            cells = state.patch.num_cells_global[d]
            nshards = shape[nm]
            if cells % nshards != 0:
                raise ValueError(
                    f"num_cells[{d}]={cells} not divisible by mesh axis "
                    f"{nm}={nshards}")
            if cells // nshards < self.num_ghost:
                raise ValueError(
                    f"local block along dim {d} ({cells // nshards}) smaller "
                    f"than num_ghost={self.num_ghost}")

        qspec = P(None, *names)
        allaxes = tuple(mesh.axis_names)
        has_aux = state.aux is not None

        if has_aux:
            def local(q, aux, dt, t):
                q_new, cfl = step_fn(q, aux, dt, t)
                return q_new, lax.pmax(cfl, allaxes)
            fn = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(qspec, qspec, P(), P()),
                out_specs=(qspec, P())))
            return fn
        else:
            def local(q, dt, t):
                q_new, cfl = step_fn(q, None, dt, t)
                return q_new, lax.pmax(cfl, allaxes)
            inner = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(qspec, P(), P()),
                out_specs=(qspec, P())))
            return lambda q, aux, dt, t: inner(q, dt, t)


class ClawSolver1D(_DistributedMixin, classic.ClawSolver1D):
    pass


class ClawSolver2D(_DistributedMixin, classic.ClawSolver2D):
    pass


class ClawSolver3D(_DistributedMixin, classic.ClawSolver3D):
    pass


class SharpClawSolver1D(_DistributedMixin, sharpclaw.SharpClawSolver1D):
    pass


class SharpClawSolver2D(_DistributedMixin, sharpclaw.SharpClawSolver2D):
    pass


class SharpClawSolver3D(_DistributedMixin, sharpclaw.SharpClawSolver3D):
    pass
