"""Solver base: time stepping, BC policy, CFL accept/reject.

Rebuild of reference ``src/pyclaw/solver.py — class Solver`` (:~1-800;
SURVEY.md §2.1, call stack §3.1).  Behavioral parity:

  - attrs: dt_initial, dt_variable, dt_max, max_steps, cfl_max/cfl_desired
    (subclass), num_ghost, per-dim bc_lower/bc_upper + aux variants +
    user_bc_* callbacks, all_bcs sugar, before_step hook, fwave flag,
    status dict {cflmax, dtmin, dtmax, numsteps}.
  - ``evolve_to_time(solution, tend)`` — THE outer time loop: adjust dt to
    land on tend, snapshot q when dt_variable, call abstract step(), then
    CFL accept/reject (reject → restore q, dt *= cfl_desired/cfl, retry),
    advance t, dt = min(dt_max, dt*cfl_desired/cfl); raise after max_steps.

TPU-native differences:
  - q lives on device (jnp) across the whole evolve loop; the host sees one
    scalar sync per step (the CFL readback — same cadence as the reference's
    per-step CFL check, and as PetClaw's MPI allreduce).
  - "snapshot for rejection" is free: arrays are immutable, we just keep the
    previous reference (no copy, no donation hazard).
  - BCs are applied *inside* the jitted step (pyclaw_tpu.bc.extend), not via
    workspace copies.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from .cfl import CFL

logger = logging.getLogger("pyclaw.solver")


class BC:
    """Boundary-condition ids (reference solver.py — class BC)."""
    custom = 0
    extrap = 1
    periodic = 2
    wall = 3


class Solver:
    def __init__(self, riemann_solver=None):
        self.dt_initial = 0.1
        self.dt_variable = True
        self.dt_max = 1e99
        self.dt = self.dt_initial
        self.max_steps = 10000
        self.cfl_max = 1.0
        self.cfl_desired = 0.9
        self.num_ghost = 2
        self.fwave = False
        self.before_step = None
        self.rp = riemann_solver
        self.cfl = CFL()
        # device gauge-series buffer length per evolve call (see
        # _make_evolve_fn); raise it for runs with >2048 steps per
        # output frame that need every gauge sample
        self.gauge_buffer_len = 2048
        self.status = {"cflmax": 0.0, "dtmin": float("inf"),
                       "dtmax": 0.0, "numsteps": 0,
                       # observability (SURVEY.md §5.1): the reference has
                       # no profiling; the rebuild's primary metric is
                       # cell-updates/s, so the solver keeps a step timer.
                       # wall_time includes jit compile on the first call.
                       "wall_time": 0.0, "cell_updates": 0,
                       "cell_updates_per_sec": 0.0}
        self.verbosity = 0
        self.logger = logger

        # per-dimension BC settings; sized at setup from the domain
        self.bc_lower = []
        self.bc_upper = []
        self.aux_bc_lower = []
        self.aux_bc_upper = []
        self.user_bc_lower = None
        self.user_bc_upper = None
        self.user_aux_bc_lower = None
        self.user_aux_bc_upper = None

        self._is_set_up = False
        self._q_dev = None
        self._aux_dev = None

    # -- all_bcs sugar (reference solver.py — all_bcs property) --------
    @property
    def all_bcs(self):
        return self.bc_lower, self.bc_upper

    @all_bcs.setter
    def all_bcs(self, bc_kind):
        n = len(self.bc_lower) or getattr(self, "num_dim", 1)
        self.bc_lower = [bc_kind] * n
        self.bc_upper = [bc_kind] * n

    @staticmethod
    def _weak_params(problem_data):
        """problem_data snapshot for the jitted kernels with numpy
        scalars coerced to weak-typed Python numbers: an np.float64
        physics constant (e.g. zz = np.sqrt(rho*bulk)) would otherwise
        PROMOTE an f32 run's whole state to f64 inside the traced step
        (caught by the on-device f32 golden validation, round 4).
        Values are unchanged — f64 runs are bitwise identical."""
        import numpy as _np
        return {k: (v.item() if isinstance(v, _np.generic) else v)
                for k, v in problem_data.items()}

    def _size_bc_lists(self, num_dim):
        for name in ("bc_lower", "bc_upper"):
            lst = getattr(self, name)
            if not lst:
                setattr(self, name, [BC.extrap] * num_dim)
            elif len(lst) != num_dim:
                if len(lst) == 1:
                    setattr(self, name, lst * num_dim)
                else:
                    raise ValueError(f"{name} has wrong length")
        for name in ("aux_bc_lower", "aux_bc_upper"):
            lst = getattr(self, name)
            if not lst:
                setattr(self, name, [BC.extrap] * num_dim)
            elif len(lst) == 1 and num_dim > 1:
                setattr(self, name, lst * num_dim)
        # periodic must be paired (reference validates this)
        for d in range(num_dim):
            lo, up = self.bc_lower[d], self.bc_upper[d]
            if (lo == BC.periodic) != (up == BC.periodic):
                raise ValueError(
                    f"dimension {d}: periodic BCs must be set on both sides")

    # ------------------------------------------------------------------
    def setup(self, solution):
        """Subclasses build their jitted step function here."""
        raise NotImplementedError

    def _extend_bc(self, q, aux, t, state):
        """Ghost-cell extension + custom-BC callbacks (traced).  The
        distributed overlay (pyclaw_tpu.parallel) overrides this with the
        ppermute halo exchange — the reference's get_qbc_from_q /
        DMDA globalToLocal seam."""
        from . import bc as bcmod
        g = self.num_ghost
        qbc = bcmod.extend(q, g, self.bc_lower, self.bc_upper,
                           wall_reflects=True)
        auxbc = None
        if aux is not None:
            auxbc = bcmod.extend(aux, g, self.aux_bc_lower, self.aux_bc_upper,
                                 wall_reflects=False)
            if self.user_aux_bc_lower is not None:
                for d in range(self.num_dim):
                    if self.aux_bc_lower[d] == bcmod.BC.custom:
                        auxbc = self.user_aux_bc_lower(state, d, t, qbc,
                                                       auxbc, g)
            if self.user_aux_bc_upper is not None:
                for d in range(self.num_dim):
                    if self.aux_bc_upper[d] == bcmod.BC.custom:
                        auxbc = self.user_aux_bc_upper(state, d, t, qbc,
                                                       auxbc, g)
        for d in range(self.num_dim):
            if self.bc_lower[d] == bcmod.BC.custom:
                if self.user_bc_lower is None:
                    raise ValueError("bc_lower is custom but user_bc_lower "
                                     "is not set")
                qbc = self.user_bc_lower(state, d, t, qbc, auxbc, g)
            if self.bc_upper[d] == bcmod.BC.custom:
                if self.user_bc_upper is None:
                    raise ValueError("bc_upper is custom but user_bc_upper "
                                     "is not set")
                qbc = self.user_bc_upper(state, d, t, qbc, auxbc, g)
        return qbc, auxbc

    def _finalize_step(self, step_fn, state):
        """Compile the traced step function.  The distributed overlay
        overrides this to wrap step_fn in shard_map + pmax CFL reduction."""
        import jax
        return jax.jit(step_fn)

    def _kernel_cells(self, state):
        """Interior cell counts the hyperbolic kernel actually sees:
        the global grid in serial runs.  The distributed overlay
        overrides this with the shard-LOCAL block shape — tile-geometry
        decisions (the Pallas dispatch in classic/sharpclaw) must key
        off the block each per-shard kernel instance receives inside
        shard_map, not the global grid."""
        return tuple(state.patch.num_cells_global)

    def _is_distributed(self):
        """True under the distributed overlay (it overrides
        _wrap_bc_kernel).  The Pallas dispatch uses this to RAISE on
        shard-local geometries its Mosaic-legal kernels cannot tile —
        the serial fallbacks (apron/single-block kernels) would build,
        but fail Mosaic's DMA-alignment rule at first step on the
        tunneled TPU; raising instead triggers the distributed mixin's
        clean setup-time fallback to the XLA kernels."""
        return type(self)._wrap_bc_kernel is not Solver._wrap_bc_kernel

    def _wrap_bc_kernel(self, kern, state):
        """Combine ghost extension with an interior kernel
        ``kern(qbc, auxbc, dt, t) -> (interior_result, cfl)`` (the kernel
        consumes a ghost-padded array and returns an array shrunk by
        2*num_ghost per spatial axis).  Seam #3 of the parallel overlay:
        the distributed mixin overrides this to run the kernel as an
        interior block (independent of the halo ppermutes) plus boundary
        bands, so XLA overlaps communication with interior compute."""
        def stepper(q, aux, dt, t):
            qbc, auxbc = self._extend_bc(q, aux, t, state)
            return kern(qbc, auxbc, dt, t)
        return stepper

    def _wrap_bc_kernel_aligned(self, kern, state, tail):
        """Fused-BC variant of :meth:`_wrap_bc_kernel` for the Pallas
        row-tiled kernels (round 5): builds the ghost-padded array
        directly at the kernel's DMA-aligned shape with
        ``bc.extend_aligned`` (one jnp.pad instead of two
        concatenations + an alignment pad).  ``kern`` receives the
        prepadded qbc and must be built with the matching
        ``prepadded_interior``.  Returns None when the fast path does
        not apply — distributed overlay (which overrides
        _wrap_bc_kernel with the halo-exchange form), aux arrays,
        non-2D, or a BC combination extend_aligned does not fuse — and
        the caller falls back."""
        from . import bc as bcmod
        base = Solver._wrap_bc_kernel
        overridden = type(self)._wrap_bc_kernel is not base
        if (overridden or state.aux is not None
                or self.num_dim != len(tail)):
            return None
        g = self.num_ghost
        lower = tuple(self.bc_lower)
        upper = tuple(self.bc_upper)
        kinds = set(lower) | set(upper)
        if not (kinds == {bcmod.BC.extrap} or kinds == {bcmod.BC.periodic}):
            return None

        def stepper(q, aux, dt, t):
            qbc = bcmod.extend_aligned(q, g, lower, upper, tail=tail)
            return kern(qbc, None, dt, t)
        return stepper

    def step(self, solution):
        """One Δt step on device arrays; must set self.cfl local max."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _push(self, state):
        self._q_dev = jnp.asarray(state.q)
        self._aux_dev = None if state.aux is None else jnp.asarray(state.aux)
        state.q_dev = self._q_dev

    def _pull(self, state):
        state.q_dev = self._q_dev   # sharded-IO seam: fileio.sharded writes
        #                             the device array, never a gather
        if not getattr(self._q_dev, "is_fully_addressable", True):
            # multi-host: the global array cannot materialize on one host;
            # state.q keeps the device handle (sharded IO consumes q_dev)
            state.q = self._q_dev
            return
        q = np.asarray(self._q_dev)
        if not q.flags.writeable:      # zero-copy views of jax arrays are
            q = q.copy()               # read-only; hooks may mutate state.q
        state.q = q

    # -- fully-traced evolve loop --------------------------------------
    def _make_evolve_fn(self, state=None):
        """Build a jitted lax.while_loop running the ENTIRE adaptive
        accept/reject time loop on device.  The reference does one
        device->host CFL readback per step (fine over PCIe, ruinous over a
        tunneled/remote device: ~0.5 s per transfer on axon); this path
        syncs the host exactly once per output frame.

        Semantics match evolve_to_time's host loop except one corner: when
        a final clipped step (dt -> tend-t) is rejected, the next dt is
        derived from the clipped value rather than the unclipped one.
        """
        import jax
        from jax import lax

        step = self._step_fn
        cfl_max = self.cfl_max
        cfl_desired = self.cfl_desired
        dt_max = self.dt_max
        dt_variable = self.dt_variable
        max_steps = self.max_steps

        # gauges: gather q at registered cells each accepted step into a
        # preallocated buffer carried through the while_loop (the
        # reference appends per step from the host; one device sync per
        # step would defeat the traced loop)
        gauge_gather = None
        if state is not None and state.patch.grid.gauge_indices:
            import numpy as _np
            gidx = _np.asarray(state.patch.grid.gauge_indices)  # (ng, ndim)
            idx_tuple = tuple(jnp.asarray(gidx[:, d])
                              for d in range(gidx.shape[1]))

            def gauge_gather(qdev):
                return qdev[(slice(None),) + idx_tuple]  # (num_eqn, ng)

        def evolve(q, aux, t0, dt0, tend):
            big = jnp.asarray(1e99, dtype=jnp.result_type(float))

            def cond(c):
                return (c[1] < tend - 1e-12) & (c[3] + c[4] < max_steps)

            def body(c):
                q_, t, dt, ns, nr, cm, dmin, dmax_, gt, gq = c
                dt_try = jnp.minimum(dt, tend - t)
                # time bookkeeping stays in the default (f64) dtype; the
                # kernel sees q.dtype scalars so f32 runs stay f32
                q_new, cfl = step(q_, aux, dt_try.astype(q_.dtype),
                                  t.astype(q_.dtype))
                cfl = cfl.astype(t.dtype)
                if dt_variable:
                    ok = jnp.isfinite(cfl) & (cfl <= cfl_max)
                else:
                    ok = jnp.asarray(True)
                q_ = jnp.where(ok, q_new, q_)
                if gauge_gather is not None:
                    # mode='drop': steps beyond the buffer are discarded
                    # (host warns) instead of clobbering the last entry
                    gt = gt.at[ns].set(jnp.where(ok, t + dt_try, gt[ns]),
                                       mode="drop")
                    gq = gq.at[ns].set(jnp.where(ok, gauge_gather(q_),
                                                 gq[ns]), mode="drop")
                t = jnp.where(ok, t + dt_try, t)
                ns = ns + jnp.int32(ok)
                nr = nr + jnp.int32(~ok)
                cm = jnp.where(ok, jnp.maximum(cm, cfl), cm)
                dmin = jnp.where(ok, jnp.minimum(dmin, dt_try), dmin)
                dmax_ = jnp.where(ok, jnp.maximum(dmax_, dt_try), dmax_)
                if dt_variable:
                    good = jnp.isfinite(cfl) & (cfl > 0.0)
                    dt = jnp.where(
                        good,
                        jnp.minimum(dt_max, dt_try * cfl_desired
                                    / jnp.where(good, cfl, 1.0)),
                        dt_try * 0.5)
                return (q_, t, dt, ns, nr, cm, dmin, dmax_, gt, gq)

            ftype = jnp.result_type(float)
            if gauge_gather is None:
                gt0 = jnp.zeros((0,), ftype)
                gq0 = jnp.zeros((0,), q.dtype)
            else:
                # device gauge buffer: bounded by gauge_buffer_len, not
                # max_steps (10000 x num_eqn x num_gauges would bite for
                # many gauges); overflow entries are dropped + warned
                ng = len(state.patch.grid.gauge_indices)
                nbuf = min(max_steps, self.gauge_buffer_len)
                gt0 = jnp.zeros((nbuf,), ftype)
                gq0 = jnp.zeros((nbuf, q.shape[0], ng), q.dtype)
            init = (q, jnp.asarray(t0, dtype=ftype),
                    jnp.asarray(dt0, dtype=ftype),
                    jnp.int32(0), jnp.int32(0),
                    jnp.zeros((), ftype), big,
                    jnp.zeros((), ftype), gt0, gq0)
            return lax.while_loop(cond, body, init)

        return jax.jit(evolve)

    def _can_use_traced_evolve(self, state):
        return (self.before_step is None
                and getattr(self, "traced_evolve", True))

    def _evolve_traced(self, solution, tend):
        state = solution.states[0]
        if getattr(self, "_evolve_fn", None) is None:
            self._evolve_fn = self._make_evolve_fn(state)
        out = self._evolve_fn(self._q_dev, self._aux_dev, state.t, self.dt,
                              tend)
        q, t, dt, ns, nr, cm, dmin, dmax_, gt, gq = out
        self._q_dev = q
        # single host sync for the status scalars
        ns = int(ns)
        nr = int(nr)
        t = float(t)
        if t < tend - 1e-12:
            raise Exception(
                f"Unable to reach tend={tend} within {self.max_steps} "
                f"steps (t={t}, accepted={ns}, rejected={nr})")
        state.t = tend
        self.dt = float(dt)
        if state.patch.grid.gauge_indices and ns > 0:
            n_rec = ns
            if n_rec > gt.shape[0]:
                logger.warning(
                    "gauge buffer overflow: %d accepted steps > "
                    "gauge_buffer_len=%d; later samples dropped — raise "
                    "solver.gauge_buffer_len", n_rec, gt.shape[0])
                n_rec = gt.shape[0]
            gt_h = np.asarray(gt[:n_rec])
            gq_h = np.asarray(gq[:n_rec])  # (n_rec, num_eqn, ng)
            for i in range(n_rec):
                for num in range(gq_h.shape[2]):
                    state.gauge_data.append((num, float(gt_h[i]),
                                             gq_h[i, :, num]))
        self.cfl.update_global_max(float(cm))
        self.status["numsteps"] += ns
        self.status["cflmax"] = max(self.status["cflmax"], float(cm))
        if ns > 0:
            self.status["dtmin"] = min(self.status["dtmin"], float(dmin))
            self.status["dtmax"] = max(self.status["dtmax"], float(dmax_))
        return self.status

    def accept_reject_step(self, cfl):
        import math
        if self.dt_variable and not math.isfinite(cfl):
            return False  # NaN/inf CFL (blown-up trial step): always reject
        return (not self.dt_variable) or cfl <= self.cfl_max

    def evolve_to_time(self, solution, tend=None):
        """Advance to tend (or one step).  Wraps the actual loop with the
        step timer / cell-updates-per-second counter (SURVEY.md §5.1)."""
        import time
        ns0 = self.status["numsteps"]
        t_wall = time.perf_counter()
        try:
            return self._evolve_to_time(solution, tend)
        finally:
            elapsed = time.perf_counter() - t_wall
            cells = 1
            for n in solution.states[0].q.shape[1:]:
                cells *= int(n)
            self.status["wall_time"] += elapsed
            self.status["cell_updates"] += \
                (self.status["numsteps"] - ns0) * cells
            if self.status["wall_time"] > 0.0:
                self.status["cell_updates_per_sec"] = (
                    self.status["cell_updates"] / self.status["wall_time"])

    def _evolve_to_time(self, solution, tend=None):
        state = solution.states[0]
        if not self._is_set_up:
            self.setup(solution)

        take_one_step = tend is None
        tstart = state.t
        if not self.dt_variable:
            if not take_one_step:
                n = (tend - tstart) / self.dt
                if abs(n - round(n)) > 1e-6:
                    raise ValueError(
                        "With dt_variable=False, tend-tstart must be an "
                        "integer multiple of dt")
        max_steps = 1 if (take_one_step and not self.dt_variable) \
            else self.max_steps

        self._push(state)

        if not take_one_step and self._can_use_traced_evolve(state):
            status = self._evolve_traced(solution, tend)
            self._pull(state)
            return status

        num_steps = 0
        while True:
            num_steps += 1
            if num_steps > max_steps:
                raise Exception(
                    f"Unable to reach tend={tend} within {self.max_steps} "
                    f"steps (t={state.t}, dt={self.dt})")

            if self.before_step is not None:
                # hook may mutate host q — round-trip (reference semantics)
                self._pull(state)
                self.before_step(self, state)
                self._push(state)

            saved_q = self._q_dev          # immutable snapshot: free
            dt_old = self.dt
            if not take_one_step and state.t + self.dt > tend - 1e-14:
                self.dt = tend - state.t

            self.step(solution)            # updates _q_dev, cfl cache
            cfl = self.cfl.get_cached_max()

            if self.accept_reject_step(cfl):
                state.t += self.dt
                self.status["numsteps"] += 1
                self.status["cflmax"] = max(self.status["cflmax"], cfl)
                self.status["dtmin"] = min(self.status["dtmin"], self.dt)
                self.status["dtmax"] = max(self.status["dtmax"], self.dt)
                if self.verbosity >= 3:
                    logger.info("step %d: t=%g dt=%g cfl=%g",
                                self.status["numsteps"], state.t, self.dt, cfl)
                self.write_gauge_values(state)
            else:
                self._q_dev = saved_q      # reject: restore
                self.dt = dt_old
                if self.verbosity >= 2:
                    logger.info("rejecting step: cfl=%g > %g", cfl, self.cfl_max)

            import math
            if self.dt_variable:
                if not math.isfinite(cfl):
                    # blown-up trial step gives no usable CFL: halve and retry
                    self.dt = 0.5 * self.dt
                elif cfl > 0.0:
                    self.dt = min(self.dt_max,
                                  self.dt * self.cfl_desired / cfl)
            if take_one_step:
                if self.accept_reject_step(cfl):
                    break
            elif state.t >= tend - 1e-14:
                break

        self._pull(state)
        return self.status

    # -- gauges (reference solver.py — write_gauge_values :~) ----------
    def write_gauge_values(self, state):
        grid = state.patch.grid
        if not grid.gauge_indices:
            return
        q = self._q_dev
        for num, idx in enumerate(grid.gauge_indices):
            vals = np.asarray(q[(slice(None),) + idx])
            state.gauge_data.append((num, state.t, vals))
