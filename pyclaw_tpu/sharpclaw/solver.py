"""SharpClaw method-of-lines solvers (1D/2D/3D).

Rebuild of reference ``src/pyclaw/sharpclaw/solver.py — SharpClawSolver``
(:~1-600) + dimensional subclasses (:~600-1000); SURVEY.md §2.3, call stack
§3.2.  Supported time integrators: Euler, SSP33 (Shu-Osher), SSP104
(Ketcheson low-storage 10-stage 4th-order); the SSP-LMM family is not yet
ported.  The full multi-stage step (all dq evaluations, all BC extensions)
compiles into ONE jitted XLA program.

Attribute parity: time_integrator, lim_type (1=TVD, 2=WENO), weno_order,
tfluct_solver/tfluct, dq_src (semidiscrete source: fn(solver, state, q, dt,
t) -> dq contribution, jax-traceable), call_before_step_each_stage,
cfl_max/cfl_desired per-integrator defaults (SSP104: 2.5/2.45).
char_decomp (characteristic-wise reconstruction) is not yet ported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DEFAULT_BACKEND
from ..solver import Solver
from . import kernels

_CFL_DEFAULTS = {
    "Euler": (0.45, 0.5),
    "SSP33": (0.9, 1.0),
    "SSP104": (2.45, 2.5),
}


class SharpClawSolver(Solver):
    num_dim = None

    def __init__(self, riemann_solver=None):
        super().__init__(riemann_solver)
        self.time_integrator = "SSP104"
        self.lim_type = 2
        self.weno_order = 5
        self.tvd_limiter = 4           # MC, used when lim_type == 1
        self.tfluct_solver = False
        self.tfluct = None
        self.aux_time_dep = False
        self.dq_src = None
        self.call_before_step_each_stage = False
        self.char_decomp = 0
        self.backend = DEFAULT_BACKEND
        self._step_fn = None
        self._cfl_set_by_user = False

    @property
    def _weno_ghost(self):
        if self.lim_type == 2:
            return (self.weno_order + 1) // 2
        return 2

    def setup(self, solution):
        state = solution.states[0]
        if self.rp is None:
            raise ValueError("no Riemann solver attached")
        if state.num_eqn != self.rp.num_eqn:
            raise ValueError("State.num_eqn mismatch with Riemann solver")
        self.num_ghost = self._weno_ghost
        self._size_bc_lists(self.num_dim)
        if not self._cfl_set_by_user and self.time_integrator in _CFL_DEFAULTS:
            self.cfl_desired, self.cfl_max = _CFL_DEFAULTS[self.time_integrator]
        if self.dt_initial is not None:
            self.dt = self.dt_initial
        self._step_fn = self._finalize_step(self._make_step(state), state)
        self._is_set_up = True

    # ------------------------------------------------------------------
    def _make_dq(self, state):
        """Return traced fn (q, aux, dt, t) -> (dq_interior, cfl)."""
        rp = self.rp.rp
        params = dict(state.problem_data)
        lim_type = self.lim_type
        weno_order = self.weno_order
        index_capa = state.index_capa
        g = self.num_ghost
        deltas = state.patch.delta
        tfluct = self.tfluct if self.tfluct_solver else None
        num_dim = self.num_dim
        dq_src = self.dq_src

        def dq(q, aux, dt, t):
            qbc, auxbc = self._extend_bc(q, aux, t, state)
            if num_dim == 1:
                d, cfl = kernels.dq_1d(qbc, auxbc, dt, deltas[0], rp, params,
                                       lim_type, weno_order, index_capa, g,
                                       tfluct=tfluct)
            else:
                d, cfl = kernels.dq_nd(qbc, auxbc, dt, deltas, rp, params,
                                       lim_type, weno_order, index_capa, g,
                                       tfluct=tfluct)
            if dq_src is not None:
                d = d + dt * dq_src(self, state, q, dt, t)
            return d, cfl
        return dq

    def _make_step(self, state):
        dq = self._make_dq(state)
        integrator = self.time_integrator

        if integrator == "Euler":
            def step(q, aux, dt, t):
                d, cfl = dq(q, aux, dt, t)
                return q + d, cfl

        elif integrator == "SSP33":
            def step(q, aux, dt, t):
                d1, c1 = dq(q, aux, dt, t)
                q1 = q + d1
                d2, c2 = dq(q1, aux, dt, t + dt)
                q2 = 0.75 * q + 0.25 * (q1 + d2)
                d3, c3 = dq(q2, aux, dt, t + 0.5 * dt)
                qn = q / 3.0 + (2.0 / 3.0) * (q2 + d3)
                return qn, jnp.maximum(c1, jnp.maximum(c2, c3))

        elif integrator == "SSP104":
            def step(q, aux, dt, t):
                # Ketcheson SSP(10,4) low-storage 2-register scheme
                # (reference sharpclaw/solver.py SSP104 branch)
                s1 = q
                cfl = jnp.zeros((), q.dtype)
                for i in range(5):
                    d, c = dq(s1, aux, dt, t + i * dt / 6.0)
                    s1 = s1 + d / 6.0
                    cfl = jnp.maximum(cfl, c)
                s2 = q / 25.0 + (9.0 / 25.0) * s1
                s1 = 15.0 * s2 - 5.0 * s1
                for i in range(4):
                    d, c = dq(s1, aux, dt, t + (i + 6) * dt / 6.0)
                    s1 = s1 + d / 6.0
                    cfl = jnp.maximum(cfl, c)
                d, c = dq(s1, aux, dt, t + dt)
                cfl = jnp.maximum(cfl, c)
                qn = s2 + 0.6 * s1 + 0.1 * d
                return qn, cfl
        else:
            raise NotImplementedError(
                f"time_integrator {integrator!r} not ported yet "
                "(Euler, SSP33, SSP104 available)")
        return step

    def step(self, solution):
        state = solution.states[0]
        q, cfl = self._step_fn(self._q_dev, self._aux_dev, self.dt, state.t)
        self._q_dev = q
        self.cfl.update_global_max(float(cfl))


class SharpClawSolver1D(SharpClawSolver):
    num_dim = 1


class SharpClawSolver2D(SharpClawSolver):
    num_dim = 2


class SharpClawSolver3D(SharpClawSolver):
    num_dim = 3
