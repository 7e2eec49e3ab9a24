"""SharpClaw method-of-lines solvers (1D/2D/3D).

Rebuild of reference ``src/pyclaw/sharpclaw/solver.py — SharpClawSolver``
(:~1-600) + dimensional subclasses (:~600-1000); SURVEY.md §2.3, call stack
§3.2.  Supported time integrators: Euler, SSP33 (Shu-Osher), SSP104
(Ketcheson low-storage 10-stage 4th-order), generic explicit RK (Butcher
tableau), and SSPLMMk2/SSPLMMk3 with variable step sizes (omega-dependent
coefficients + SSP104 start-up + rejection-safe history).  The full
multi-stage step (all dq evaluations, all BC extensions) compiles into ONE
jitted XLA program; LMM history is host-sequenced.

Attribute parity: time_integrator, lim_type (1=TVD, 2=WENO), weno_order,
tfluct_solver/tfluct, dq_src (semidiscrete source: fn(solver, state, q, dt,
t) -> dq contribution, jax-traceable), call_before_step_each_stage,
cfl_max/cfl_desired per-integrator defaults (SSP104: 2.5/2.45).
char_decomp: 0 componentwise, 1 wave-slope (Riemann waves; TVD and
wave-space WENO forms), 2 characteristic (evec hook; TVD and WENO forms),
3 transmission-based (evec hook; local-basis jump projection — for
heterogeneous media; coincides with 2 for constant coefficients),
4 interface-basis characteristic (evec at interface arithmetic means;
coincides with 2 for constant coefficients).

time_integrator='LMM' is the reference's user-coefficient explicit linear
multistep: supply ``solver.lmm_alpha`` (length k, sums to 1) and
``solver.lmm_beta`` (length k), oldest-first, for
u^{n+1} = sum_j alpha_j u^{n-k+1+j} + dt sum_j beta_j f^{n-k+1+j}.
Requires dt_variable=False (constant-step coefficients); starts up with
SSP104 while the history fills.
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
        self.use_soa = True   # False forces the generic AoS dq kernels
        # row-tile size cap for the tiled SoA driver (keeps per-tile
        # intermediates in VMEM); 0 = monolithic sweep; None (default) =
        # resolved at setup: 128 in 1D/2D, 12 in 3D where the driver
        # tiles (x, y) (the measured sweet spots — docs/performance.md)
        self.soa_tile_rows = None
        self.backend = DEFAULT_BACKEND
        self._step_fn = None
        self._cfl_set_by_user = False
        # generic 'RK' integrator: user-supplied explicit Butcher tableau
        # (reference sharpclaw/solver.py attrs a, b, c)
        self.a = None
        self.b = None
        self.c = None
        # SSPLMM integrators (reference 'SSPLMMk2'/'SSPLMMk3'):
        self.lmm_steps = 4
        self._lmm_history = None
        # generic 'LMM': user coefficients, oldest-first (see class doc)
        self.lmm_alpha = None
        self.lmm_beta = None

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
        if self.soa_tile_rows is None:
            self.soa_tile_rows = 12 if self.num_dim == 3 else 128

        if not self._cfl_set_by_user and self.time_integrator in _CFL_DEFAULTS:
            self.cfl_desired, self.cfl_max = _CFL_DEFAULTS[self.time_integrator]
        if self.dt_initial is not None:
            self.dt = self.dt_initial
        if self.time_integrator == "LMM":
            import numpy as _np
            if self.lmm_alpha is None or self.lmm_beta is None:
                raise ValueError(
                    "time_integrator='LMM' needs solver.lmm_alpha and "
                    "solver.lmm_beta (explicit multistep coefficients, "
                    "oldest-first); or pick one of Euler, SSP33, SSP104, "
                    "RK, SSPLMMk2, SSPLMMk3")
            if self.dt_variable:
                raise ValueError(
                    "time_integrator='LMM' uses constant-step "
                    "coefficients; set solver.dt_variable = False "
                    "(SSPLMMk2/SSPLMMk3 support variable steps)")
            a = _np.asarray(self.lmm_alpha, dtype=float)
            b = _np.asarray(self.lmm_beta, dtype=float)
            if a.shape != b.shape or a.ndim != 1 or len(a) < 1:
                raise ValueError("lmm_alpha and lmm_beta must be 1-D "
                                 "arrays of equal length")
            if abs(a.sum() - 1.0) > 1e-12:
                raise ValueError(f"lmm_alpha must sum to 1 (consistency); "
                                 f"got {a.sum()}")
            self.lmm_steps = len(a)
            self._dq_fn = self._finalize_step(self._make_dq(state), state)
            self._starter_fn = self._finalize_step(
                self._make_step(state, integrator="SSP104"), state)
            self._lmm_history = []
        elif self.time_integrator in ("SSPLMMk2", "SSPLMMk3"):
            if self.dt_variable and not self._cfl_set_by_user:
                # SSP coefficient of the optimal constant-step method;
                # linear stability with WENO5 spatial operators binds well
                # below it (measured: blows up at 0.8-1.0x, clean at
                # <=0.6x), so default to half the formal bound
                k = self.lmm_steps
                order = 2 if self.time_integrator == "SSPLMMk2" else 3
                c_ssp = max(1e-6, (k - order) / (k - 1))
                self.cfl_max = 0.5 * c_ssp
                self.cfl_desired = 0.45 * c_ssp
            self._dq_fn = self._finalize_step(self._make_dq(state), state)
            self._starter_fn = self._finalize_step(
                self._make_step(state, integrator="SSP104"), state)
            self._lmm_history = []
        else:
            self._step_fn = self._finalize_step(self._make_step(state),
                                                state)
        self._is_set_up = True

    # ------------------------------------------------------------------
    def _soa_eligible(self, state):
        """The SharpClaw SoA fast path covers 2D componentwise WENO with
        no aux/capacity/tfluct for Riemann solvers with SoA variants."""
        if getattr(self, "use_soa", True) is False:
            return False
        return (self.num_dim == 2
                and self.lim_type == 2
                and self.char_decomp == 0
                and not self.tfluct_solver
                and state.aux is None
                and state.index_capa < 0
                and self.backend in ("xla", "pallas")
                and self.rp.rpn_soa is not None)

    def _make_dq(self, state):
        """Return traced fn (q, aux, dt, t) -> (dq_interior, cfl)."""
        rp = self.rp.rp
        params = self._weak_params(state.problem_data)
        lim_type = self.lim_type
        weno_order = self.weno_order
        index_capa = state.index_capa
        g = self.num_ghost
        deltas = state.patch.delta
        tfluct = self.tfluct if self.tfluct_solver else None
        num_dim = self.num_dim
        dq_src = self.dq_src
        char_decomp = self.char_decomp
        tvd_limiter = self.tvd_limiter
        evec = self.rp.evec
        positivity = self.rp.positivity
        backend = self.backend
        # per-system flux for the in-cell total fluctuation f(qr)-f(ql)
        # (reference flux1.f90 default); fwave-form solvers register no
        # flux and keep the Riemann-based fallback
        flux = None if self.tfluct_solver else self.rp.flux
        flux_soa = None if self.tfluct_solver else self.rp.flux_soa
        if char_decomp in (2, 3, 4) and evec is None:
            raise ValueError(f"char_decomp={char_decomp} needs an evec hook "
                             f"on Riemann solver {self.rp.name}")
        if char_decomp not in (0, 1, 2, 3, 4):
            raise ValueError(f"char_decomp={char_decomp} not supported "
                             "(0 componentwise, 1 wave, 2 characteristic, "
                             "3 transmission, 4 interface-basis)")

        if self._soa_eligible(state):
            # SoA fast path (sharpclaw/soa.py): same numerics, no
            # transposes / AoS wave tensors — the cfg4 hot path
            from . import soa as sc_soa
            rpn_soa = self.rp.rpn_soa
            dx2, dy2 = deltas
            tile_rows = getattr(self, "soa_tile_rows", 128)
            nx, ny = self._kernel_cells(state)
            rows_tile = next((t for t in (32, 16, 8)
                              if nx % t == 0), None)
            if (backend == "pallas" and ny % 128 == 0
                    and rows_tile is not None):
                # fused on-chip per-stage dq (round 5; see the classic
                # dispatch for the geometry and VMEM-sizing story)
                from ..ops import tiled2d
                fetch = rows_tile + 2 * g + (-(rows_tile + 2 * g)) % 8
                lanes = ny + 2 * g + (-(ny + 2 * g)) % 128
                need_mb = 16.5 * (lanes / 1152.0) * (fetch / 36.0)
                vmem_mb = (None if need_mb < 14.0
                           else min(112, int(need_mb * 1.5 + 8)))

                def kern_soa(qbc, auxbc, dt, t):
                    return tiled2d.dq_pallas_rows(
                        qbc, dt, dx2, dy2, rpn_soa, params, weno_order,
                        g, positivity=positivity, flux_soa=flux_soa,
                        tile_rows=rows_tile, vmem_limit_mb=vmem_mb)

                # single-pass aligned BC build per stage (skips the
                # kernel's internal alignment pad — the BC+pad chain
                # was ~18% of the SSP104 step)
                pad_rows = max(0, fetch - 2 * g - rows_tile)
                pad_lanes = lanes - (ny + 2 * g)

                def kern_soa_pre(qbc, auxbc, dt, t):
                    return tiled2d.dq_pallas_rows(
                        qbc, dt, dx2, dy2, rpn_soa, params, weno_order,
                        g, positivity=positivity, flux_soa=flux_soa,
                        tile_rows=rows_tile, vmem_limit_mb=vmem_mb,
                        prepadded_interior=(nx, ny))
                aligned = self._wrap_bc_kernel_aligned(
                    kern_soa_pre, state, (pad_rows, pad_lanes))
                if aligned is not None:
                    base = aligned
                    if dq_src is None:
                        return base

                    def dq_sa(q, aux, dt, t):
                        d, cfl = base(q, aux, dt, t)
                        return (d + dt * dq_src(self, state, q, dt, t),
                                cfl)
                    return dq_sa
            else:
                if backend == "pallas" and self._is_distributed():
                    # a silent fallthrough here would leave the mixin's
                    # pallas setup in place (blocking halos, vma checks
                    # off, backend label wrong) around a pure-XLA
                    # kernel; raise so setup falls back cleanly
                    raise ValueError(
                        f"backend='pallas': shard-local block "
                        f"({nx},{ny}) needs rows divisible by 8 and "
                        f"the last axis by 128 for the dq row kernel; "
                        f"using the XLA kernels")

                def kern_soa(qbc, auxbc, dt, t):
                    return sc_soa.dq_2d_soa_tiled(
                        qbc, dt, dx2, dy2, rpn_soa, params, weno_order,
                        g, positivity=positivity, tile_rows=tile_rows,
                        flux_soa=flux_soa)
            base = self._wrap_bc_kernel(kern_soa, state)
            if dq_src is None:
                return base

            def dq_s(q, aux, dt, t):
                d, cfl = base(q, aux, dt, t)
                return d + dt * dq_src(self, state, q, dt, t), cfl
            return dq_s

        def kern(qbc, auxbc, dt, t):
            if num_dim == 1:
                return kernels.dq_1d(qbc, auxbc, dt, deltas[0], rp, params,
                                     lim_type, weno_order, index_capa, g,
                                     tfluct=tfluct,
                                     char_decomp=char_decomp, evec=evec,
                                     positivity=positivity,
                                     backend=backend,
                                     tvd_limiter=tvd_limiter, flux=flux)
            return kernels.dq_nd_tiled(qbc, auxbc, dt, deltas, rp, params,
                                       lim_type, weno_order, index_capa,
                                       g, tfluct=tfluct,
                                       char_decomp=char_decomp, evec=evec,
                                       positivity=positivity,
                                       backend=backend,
                                       tvd_limiter=tvd_limiter,
                                       tile_rows=getattr(
                                           self, "soa_tile_rows", 128),
                                       flux=flux)
        base = self._wrap_bc_kernel(kern, state)
        if dq_src is None:
            return base

        def dq(q, aux, dt, t):
            d, cfl = base(q, aux, dt, t)
            return d + dt * dq_src(self, state, q, dt, t), cfl
        return dq

    def _make_step(self, state, integrator=None):
        dq = self._make_dq(state)
        integrator = integrator or self.time_integrator

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
            from jax import lax

            def step(q, aux, dt, t):
                # Ketcheson SSP(10,4) low-storage 2-register scheme
                # (reference sharpclaw/solver.py SSP104 branch).  The two
                # identical-stage runs are lax.fori_loops so the dq graph
                # is traced/compiled 3x, not 10x (10 unrolled SoA stages
                # took minutes of XLA compile at 1024^2)
                def body(i, carry, off):
                    s1_, cfl_ = carry
                    d, c = dq(s1_, aux, dt, t + (i + off) * dt / 6.0)
                    return s1_ + d / 6.0, jnp.maximum(cfl_, c)

                # the initial CFL carry must be a function of q: inside
                # shard_map the per-stage CFL is device-varying, and a
                # replicated literal zero would mismatch the loop-carry
                # varying-axes type (serial runs see a plain 0.0)
                cfl0 = q.ravel()[0] * 0.0
                s1, cfl = lax.fori_loop(
                    0, 5, lambda i, c: body(i, c, 0), (q, cfl0))
                s2 = q / 25.0 + (9.0 / 25.0) * s1
                s1 = 15.0 * s2 - 5.0 * s1
                s1, cfl = lax.fori_loop(
                    0, 4, lambda i, c: body(i, c, 6), (s1, cfl))
                d, c = dq(s1, aux, dt, t + dt)
                qn = s2 + 0.6 * s1 + 0.1 * d
                cfl = jnp.maximum(cfl, c)
                return qn, cfl
        elif integrator == "RK":
            # generic explicit Runge-Kutta from the user's Butcher tableau
            # (reference sharpclaw 'RK' branch).  dq already carries dt.
            import numpy as _np
            if self.a is None or self.b is None:
                raise ValueError("time_integrator='RK' needs solver.a and "
                                 "solver.b (Butcher tableau)")
            A = _np.asarray(self.a, dtype=float)
            b = _np.asarray(self.b, dtype=float)
            c = (_np.asarray(self.c, dtype=float) if self.c is not None
                 else A.sum(axis=1))
            nstage = len(b)

            def step(q, aux, dt, t):
                ks = []
                cfl = jnp.zeros(())
                for i in range(nstage):
                    yi = q
                    for j in range(i):
                        if A[i, j] != 0.0:
                            yi = yi + float(A[i, j]) * ks[j]
                    d, cc = dq(yi, aux, dt, t + float(c[i]) * dt)
                    ks.append(d)
                    cfl = jnp.maximum(cfl, cc)
                qn = q
                for i in range(nstage):
                    if b[i] != 0.0:
                        qn = qn + float(b[i]) * ks[i]
                return qn, cfl

        elif integrator in ("SSPLMMk2", "SSPLMMk3", "LMM"):
            # multistep methods are host-sequenced in self.step() (they
            # need solution history); setup() never routes them here
            raise ValueError(
                f"internal error: {integrator!r} is stepped through the "
                "multistep path, not a one-step function")
        else:
            raise NotImplementedError(
                f"time_integrator {integrator!r} not ported yet "
                "(Euler, SSP33, SSP104, RK, SSPLMMk2, SSPLMMk3 available)")
        return step

    # -- SSP linear multistep methods ----------------------------------
    # Optimal explicit SSP k-step methods with VARIABLE step size
    # (reference sharpclaw/solver.py SSPLMMk2/k3 + its step-ratio
    # machinery).  With Omega = (t_n - t_{n-k+1}) / h  (sum of the
    # previous k-1 steps over the current one), second-order Taylor
    # matching about t_n gives
    #   order 2: ak = 1/Omega^2, a0 = 1-ak, b0 = (Omega+1)/Omega
    #   order 3: ak = (3*Omega+2)/Omega^3, a0 = 1-ak,
    #            b0 = ((Omega+1)/Omega)^2, bk = (Omega+1)/Omega^2
    # in  u^{n+1} = a0 u^n + ak u^{n-k+1} + h (b0 f^n + bk f^{n-k+1}).
    # Constant steps (Omega = k-1) reduce these to the published optimal
    # coefficients — e.g. k=4, order 3 is Shu's SSPLMM(4,3)
    # (16/27, 11/27, 16/9 h, 4/9 h).  Positivity of a0 (the SSP convex
    # decomposition) needs Omega > 1 (order 2) / Omega >= 2 (order 3);
    # _lmm_step clamps dt to keep Omega above that floor.
    def _lmm_coeffs(self, omega):
        if self.lmm_steps < 3:
            raise ValueError("SSPLMM needs lmm_steps >= 3")
        if self.time_integrator == "SSPLMMk2":
            ak = 1.0 / omega ** 2
            return 1.0 - ak, ak, (omega + 1.0) / omega, 0.0
        ak = (3.0 * omega + 2.0) / omega ** 3
        a0 = 1.0 - ak
        b0 = ((omega + 1.0) / omega) ** 2
        bk = (omega + 1.0) / omega ** 2
        return a0, ak, b0, bk

    @property
    def _omega_min(self):
        return 1.001 if self.time_integrator == "SSPLMMk2" else 2.001

    def _lmm_step(self, state):
        """One LMM step (host-sequenced; history of device arrays).
        History entries are (q, f, dt) with f = dq/dt (the dt-free
        semidiscrete rate), so variable steps rescale cleanly."""
        k = self.lmm_steps
        hist = self._lmm_history
        self._lmm_hist_backup = list(hist)   # restored on step rejection
        q = self._q_dev
        if len(hist) < k - 1:
            # start-up: SSP104 steps until k-1 history entries exist
            d, cfl = self._dq_fn(q, self._aux_dev, self.dt, state.t)
            hist.append((q, d / self.dt, self.dt))
            q_new, cfl = self._starter_fn(q, self._aux_dev, self.dt, state.t)
            self._q_dev = q_new
            return float(cfl)
        if self.dt_variable:
            # keep Omega above the positivity floor
            sum_prev = sum(h[2] for h in hist)
            self.dt = min(self.dt, sum_prev / self._omega_min)
        omega = sum(h[2] for h in hist) / self.dt
        a0, ak, b0, bk = self._lmm_coeffs(omega)
        d, cfl = self._dq_fn(q, self._aux_dev, self.dt, state.t)
        hist.append((q, d / self.dt, self.dt))
        q_old, f_old, _ = hist.pop(0)       # u^{n-k+1}, f^{n-k+1}
        q_new = a0 * q + ak * q_old + b0 * d
        if bk != 0.0:
            q_new = q_new + (bk * self.dt) * f_old
        self._q_dev = q_new
        return float(cfl)

    def _generic_lmm_step(self, state):
        """One user-coefficient explicit LMM step (host-sequenced)."""
        k = self.lmm_steps
        hist = self._lmm_history
        self._lmm_hist_backup = list(hist)
        q = self._q_dev
        d, cfl = self._dq_fn(q, self._aux_dev, self.dt, state.t)
        hist.append((q, d / self.dt, self.dt))
        del hist[:-k]
        if len(hist) < k:
            q_new, cfl = self._starter_fn(q, self._aux_dev, self.dt,
                                          state.t)
            self._q_dev = q_new
            return float(cfl)
        q_new = None
        for (qi, fi, _), ai, bi in zip(hist, self.lmm_alpha,
                                       self.lmm_beta):
            term = float(ai) * qi + (float(bi) * self.dt) * fi
            q_new = term if q_new is None else q_new + term
        self._q_dev = q_new
        return float(cfl)

    def accept_reject_step(self, cfl):
        ok = super().accept_reject_step(cfl)
        if (not ok
                and self.time_integrator in ("SSPLMMk2", "SSPLMMk3", "LMM")
                and getattr(self, "_lmm_hist_backup", None) is not None):
            self._lmm_history = self._lmm_hist_backup
        return ok

    def step(self, solution):
        state = solution.states[0]
        if self.time_integrator in ("SSPLMMk2", "SSPLMMk3"):
            cfl = self._lmm_step(state)
            self.cfl.update_global_max(cfl)
            return
        if self.time_integrator == "LMM":
            cfl = self._generic_lmm_step(state)
            self.cfl.update_global_max(cfl)
            return
        q, cfl = self._step_fn(self._q_dev, self._aux_dev, self.dt, state.t)
        self._q_dev = q
        self.cfl.update_global_max(float(cfl))

    def _can_use_traced_evolve(self, state):
        if self.time_integrator in ("SSPLMMk2", "SSPLMMk3", "LMM"):
            return False  # multistep history is host-sequenced
        return super()._can_use_traced_evolve(state)


class SharpClawSolver1D(SharpClawSolver):
    num_dim = 1


class SharpClawSolver2D(SharpClawSolver):
    num_dim = 2


class SharpClawSolver3D(SharpClawSolver):
    num_dim = 3
