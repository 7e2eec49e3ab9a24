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
    """Mixin carrying the mesh + the three distributed seams
    (_extend_bc, _wrap_bc_kernel, _finalize_step)."""

    def __init__(self, riemann_solver=None, mesh=None):
        super().__init__(riemann_solver)
        self.mesh = mesh
        # Overlap halo exchange with interior compute (SURVEY.md §2.10
        # "north star requires this"); False = blocking halo prefix.
        self.overlap_halo = True

    def setup(self, solution):
        if self.backend == "pallas":
            # Round 5: the fused Mosaic kernels run per-shard inside
            # shard_map on the halo-exchanged local block (the dispatch
            # keys its tile geometry off _kernel_cells = the shard-local
            # shape).  Two adjustments vs the XLA backend:
            #   * halo/compute overlap is forced off — the overlap path
            #     feeds 3g-wide boundary bands that violate the row
            #     kernels' tile constraints; pallas uses the blocking
            #     halo-exchange prefix instead;
            #   * when the LOCAL block is ineligible (lanes not a
            #     128-multiple, rows not tileable by 8, no (x,y) tile
            #     dividing a 3D block), the dispatch raises and we fall
            #     back to the XLA kernels with the original overlap
            #     setting.
            overlap_prev = getattr(self, "overlap_halo", True)
            if overlap_prev:
                self.logger.info(
                    "backend='pallas': halo/compute overlap disabled "
                    "(fused kernels consume full local blocks)")
                self.overlap_halo = False
            try:
                super().setup(solution)
                return
            except ValueError as err:
                if "pallas" not in str(err):
                    raise
                self.logger.warning(
                    "backend='pallas' ineligible for this decomposition "
                    "(%s); falling back to the XLA kernels", err)
                self.backend = "xla"
                self.overlap_halo = overlap_prev
        super().setup(solution)

    def _kernel_cells(self, state):
        """Shard-local interior block shape (what each per-shard kernel
        instance sees inside shard_map) — the geometry the Pallas
        dispatch must tile against."""
        if self.mesh is None:
            self.mesh = make_mesh(self.num_dim)
        shape = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        return tuple(
            c // shape.get(AXIS_NAMES[d], 1)
            for d, c in enumerate(state.patch.num_cells_global))

    # -- seam 1: halo exchange (replaces serial BC extension) ----------
    def _extend_bc(self, q, aux, t, state):
        g = self.num_ghost
        names = self._axis_names
        qbc = halo.extend_local(q, g, self.bc_lower, self.bc_upper, names,
                                wall_reflects=True)
        auxbc = None
        if aux is not None:
            auxbc = halo.extend_local(aux, g, self.aux_bc_lower,
                                      self.aux_bc_upper, names,
                                      wall_reflects=False)
        return self._apply_custom_bcs(qbc, auxbc, t, state, names)

    def _owner_select(self, name, side, new, old):
        """Keep `new` only on the shard owning that physical boundary
        (the analog of petclaw/geometry.py ownership flags)."""
        if name is None:
            return new
        idx = lax.axis_index(name)
        own = (idx == 0) if side == 0 else (idx == lax.axis_size(name) - 1)
        return jnp.where(own, new, old)

    def _apply_custom_bcs(self, qbc, auxbc, t, state, names,
                          dims=None):
        """User BC callbacks, masked to boundary-owning shards.  Same
        callback contract as the serial path (bc.py module docstring);
        in distributed runs the callback must not depend on absolute
        position along a SHARDED axis (it runs on every shard and only
        boundary owners keep the result — constant/profile-along-
        unsharded-axis inflows are fine)."""
        num_dim = qbc.ndim - 1
        dims = range(num_dim) if dims is None else dims
        if auxbc is not None:
            for d in dims:
                name = names[d] if d < len(names) else None
                if (self.aux_bc_lower[d] == BC.custom
                        and self.user_aux_bc_lower is not None):
                    new = self.user_aux_bc_lower(state, d, t, qbc, auxbc,
                                                 self.num_ghost)
                    auxbc = self._owner_select(name, 0, new, auxbc)
                if (self.aux_bc_upper[d] == BC.custom
                        and self.user_aux_bc_upper is not None):
                    new = self.user_aux_bc_upper(state, d, t, qbc, auxbc,
                                                 self.num_ghost)
                    auxbc = self._owner_select(name, 1, new, auxbc)
        for d in dims:
            name = names[d] if d < len(names) else None
            if self.bc_lower[d] == BC.custom:
                if self.user_bc_lower is None:
                    raise ValueError("bc_lower is custom but user_bc_lower "
                                     "is not set")
                new = self.user_bc_lower(state, d, t, qbc, auxbc,
                                         self.num_ghost)
                qbc = self._owner_select(name, 0, new, qbc)
            if self.bc_upper[d] == BC.custom:
                if self.user_bc_upper is None:
                    raise ValueError("bc_upper is custom but user_bc_upper "
                                     "is not set")
                new = self.user_bc_upper(state, d, t, qbc, auxbc,
                                         self.num_ghost)
                qbc = self._owner_select(name, 1, new, qbc)
        return qbc, auxbc

    # -- seam 2: halo/compute overlap ----------------------------------
    def _wrap_bc_kernel(self, kern, state):
        """Interior/boundary split so communication overlaps compute
        (SURVEY.md §2.10 overlap row): the kernel runs once on the
        serial-extended-only local block — that piece has NO data
        dependency on any ppermute, so XLA's latency-hiding scheduler
        executes it while the face transfers are in flight — and once per
        boundary band (3g-wide slabs of the exchanged array, the only
        consumers of the halos).  The pieces are the SAME kernel on the
        same interface values, so the result is bitwise the serial
        decomposition (tests/test_parallel.py invariance still holds).

        Falls back to the blocking form when overlap_halo=False or a
        sharded local block is thinner than 4*num_ghost."""
        if not getattr(self, "overlap_halo", True):
            return super()._wrap_bc_kernel(kern, state)
        blocking = super()._wrap_bc_kernel(kern, state)

        def stepper(q, aux, dt, t):
            g = self.num_ghost
            names = self._axis_names
            num_dim = q.ndim - 1
            sharded = [d for d in range(num_dim)
                       if d < len(names) and names[d] is not None]
            if not sharded or any(q.shape[1 + d] < 4 * g for d in sharded):
                return blocking(q, aux, dt, t)

            qbc, auxbc = self._extend_bc(q, aux, t, state)

            # interior piece: ghost data entirely local -> comm-free
            q_in = halo.extend_serial_only(q, g, self.bc_lower,
                                           self.bc_upper, names,
                                           wall_reflects=True)
            aux_in = None
            if aux is not None:
                aux_in = halo.extend_serial_only(aux, g, self.aux_bc_lower,
                                                 self.aux_bc_upper, names,
                                                 wall_reflects=False)
            unsharded = [d for d in range(num_dim) if d not in sharded]
            q_in, aux_in = self._apply_custom_bcs(q_in, aux_in, t, state,
                                                  names, dims=unsharded)
            out, cfl = kern(q_in, aux_in, dt, t)

            # boundary bands, assembled innermost axis first
            banded = set()
            for d in reversed(sharded):
                def band(arr, lo_side):
                    sl = [slice(None)] * arr.ndim
                    for e in range(num_dim):
                        n_e = q.shape[1 + e]
                        if e == d:
                            sl[1 + e] = (slice(0, 3 * g) if lo_side
                                         else slice(n_e - g, n_e + 2 * g))
                        elif e in sharded and e not in banded:
                            sl[1 + e] = slice(g, n_e + g)
                    return arr[tuple(sl)]

                lo_a = hi_a = None
                if aux is not None:
                    lo_a, hi_a = band(auxbc, True), band(auxbc, False)
                lo_out, c_lo = kern(band(qbc, True), lo_a, dt, t)
                hi_out, c_hi = kern(band(qbc, False), hi_a, dt, t)
                out = jnp.concatenate([lo_out, out, hi_out], axis=1 + d)
                cfl = jnp.maximum(cfl, jnp.maximum(c_lo, c_hi))
                banded.add(d)
            return out, cfl
        return stepper

    def _warn_thin_shards(self, state, cap, eligible):
        """kernel_family='auto' keys off the GLOBAL row count (so serial
        and distributed runs use the same family — decomposition
        invariance); warn when the shard-local rows are too thin for
        tiling to actually engage, since the monolithic SoA family would
        then be faster (ADVICE r2 item 2)."""
        from ..classic.kernels import auto_tile
        local_rows = self._kernel_cells(state)[0]
        if eligible and auto_tile(local_rows, cap) is None:
            import logging
            logging.getLogger("pyclaw.solver").warning(
                "kernel_family='auto' picked the AoS family from the "
                "global grid, but shard-local rows (%d) are too thin "
                "for its VMEM tiling to engage; consider "
                "solver.kernel_family='soa' for this decomposition.",
                local_rows)

    # -- seam 3: shard_map + CFL reduction -----------------------------
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

        # the Pallas kernels build their pl.pallas_call out shapes
        # without varying-mesh-axes (vma) annotations, which shard_map's
        # default vma checker rejects; the XLA backend keeps the checker
        check_vma = self.backend != "pallas"
        if has_aux:
            def local(q, aux, dt, t):
                q_new, cfl = step_fn(q, aux, dt, t)
                return q_new, lax.pmax(cfl, allaxes)
            fn = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(qspec, qspec, P(), P()),
                out_specs=(qspec, P()), check_vma=check_vma))
            return fn
        else:
            def local(q, dt, t):
                q_new, cfl = step_fn(q, None, dt, t)
                return q_new, lax.pmax(cfl, allaxes)
            inner = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(qspec, P(), P()),
                out_specs=(qspec, P()), check_vma=check_vma))
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
