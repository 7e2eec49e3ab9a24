"""Shallow water on a rotating sphere (reference examples/shallow_sphere/
— Williamson et al. test suite), redesigned on a lat-lon spherical
channel: capacity kappa = cos(theta), kappa-weighted f-wave theta fluxes,
Coriolis + metric sources (see riemann/shallow_sphere.py for the
formulation; the reference's Calhoun-Helzel-LeVeque double-cover grid is
not ported).

Default scenario: Williamson TEST CASE 2 — steady geostrophic zonal flow
    u = u0 cos(theta),   v = 0,
    g h = g h0 - (u0 (2 Omega a + u0) / 2) sin^2(theta)
which is an exact steady solution; any drift is numerical error.
`perturb=True` adds a Gaussian height bump that radiates inertia-gravity
waves around the channel (a TC2-based variant of the mountain test)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann
from pyclaw_tpu.riemann.shallow_sphere import make_sphere_source


def setup(mx=128, my=64, u0=0.25, h0=1.0, omega=0.5, radius=1.0,
          grav=1.0, lat_max=1.0, perturb=False, kernel_language="xla",
          outdir="./_output"):
    solver = pyclaw.ClawSolver2D(riemann.shallow_sphere_fwave_2D)
    solver.fwave = True
    solver.dimensional_split = True      # split sweeps; kappa-weighted
    solver.limiters = [pyclaw.limiters.tvd.MC]
    solver.backend = kernel_language
    # theta boundaries: hold the analytic TC2 equilibrium in the ghost
    # rows (zeroth-order extrapolation of a non-uniform equilibrium
    # injects mass and destabilizes the channel)
    solver.bc_lower = [pyclaw.BC.periodic, pyclaw.BC.custom]
    solver.bc_upper = [pyclaw.BC.periodic, pyclaw.BC.custom]
    solver.aux_bc_lower = [pyclaw.BC.periodic, pyclaw.BC.custom]
    solver.aux_bc_upper = [pyclaw.BC.periodic, pyclaw.BC.custom]

    # computational rectangle: lambda in [0, 2 pi), theta channel
    domain = pyclaw.Domain([0.0, -lat_max], [2.0 * np.pi, lat_max],
                           [mx, my])
    state = pyclaw.State(domain, 3, num_aux=2)
    state.problem_data["grav"] = grav

    lam, th = domain.grid.c_centers
    th_edge = th - 0.5 * domain.grid.delta[1]
    state.aux[0] = np.cos(th_edge)       # kappa at lower theta edge
    state.aux[1] = np.cos(th)            # kappa at center (capacity)
    state.index_capa = 1

    # Williamson TC2 steady state
    gh = grav * h0 - 0.5 * u0 * (2.0 * omega * radius + u0) * np.sin(th) ** 2
    h = gh / grav
    u = u0 * np.cos(th)
    state.q[0] = h
    state.q[1] = h * u
    state.q[2] = 0.0
    if perturb:
        r2 = (lam - np.pi) ** 2 + (th - 0.25) ** 2
        state.q[0] = state.q[0] + 0.1 * h0 * np.exp(-20.0 * r2)

    solver.step_source = make_sphere_source(domain.grid, radius=radius,
                                            omega=omega, grav=grav)
    solver.source_split = 2              # Strang

    # custom theta BCs: analytic TC2 state + exact cos(theta) aux rows
    import jax.numpy as jnp
    dth = domain.grid.delta[1]
    ng = solver.num_ghost

    def _profile(th):
        ghp = grav * h0 - 0.5 * u0 * (2.0 * omega * radius + u0) \
            * np.sin(th) ** 2
        hp = ghp / grav
        return np.stack([hp, hp * u0 * np.cos(th), np.zeros_like(th)])

    th_lo = -lat_max - dth * (np.arange(ng, 0, -1) - 0.5)
    th_hi = lat_max + dth * (np.arange(1, ng + 1) - 0.5)
    q_lo = jnp.asarray(_profile(th_lo))          # (3, ng)
    q_hi = jnp.asarray(_profile(th_hi))
    aux_lo = jnp.asarray(np.stack([np.cos(th_lo - 0.5 * dth),
                                   np.cos(th_lo)]))
    aux_hi = jnp.asarray(np.stack([np.cos(th_hi - 0.5 * dth),
                                   np.cos(th_hi)]))

    def bc_lower(state, d, t, qbc, auxbc, g):
        return qbc.at[:, :, :g].set(q_lo[:, None, :])

    def bc_upper(state, d, t, qbc, auxbc, g):
        return qbc.at[:, :, -g:].set(q_hi[:, None, :])

    def aux_bc_lower(state, d, t, qbc, auxbc, g):
        return auxbc.at[:, :, :g].set(aux_lo[:, None, :])

    def aux_bc_upper(state, d, t, qbc, auxbc, g):
        return auxbc.at[:, :, -g:].set(aux_hi[:, None, :])

    solver.user_bc_lower = bc_lower
    solver.user_bc_upper = bc_upper
    solver.user_aux_bc_lower = aux_bc_lower
    solver.user_aux_bc_upper = aux_bc_upper

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 2.0 * np.pi / max(u0, 1e-12)   # one revolution at u0
    claw.num_output_times = 4
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
