"""2D swirl advection (reference examples/advection_2d/): incompressible
velocity field from a stream function, evaluated at cell edges so the
discrete field is exactly divergence-free (mass conservation to
roundoff)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=100, my=100, kernel_language="xla", outdir="./_output"):
    solver = pyclaw.ClawSolver2D(riemann.vc_advection_2D)
    # unsplit with transverse_waves=0: both sweeps see the SAME q, so the
    # divergence-free edge field cancels exactly (mass conservation);
    # dimensional splitting would break that cancellation
    solver.dimensional_split = False
    solver.transverse_waves = 0
    # donor-cell unsplit: stability needs the SUM of per-dim CFLs < 1
    solver.cfl_desired, solver.cfl_max = 0.45, 0.5
    solver.limiters = [pyclaw.limiters.tvd.vanleer]
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap] * 2
    solver.aux_bc_upper = [pyclaw.BC.extrap] * 2

    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, 1, num_aux=2)

    # stream function on cell corners
    xe = domain.grid.x.edges
    ye = domain.grid.y.edges
    Xe, Ye = np.meshgrid(xe, ye, indexing="ij")
    psi = (1.0 / np.pi) * np.sin(np.pi * Xe) ** 2 * np.sin(np.pi * Ye) ** 2
    dx, dy = domain.grid.delta
    # edge normal velocities (at each cell's LOWER faces):
    # u(i-1/2, j) = (psi(i-1/2, j+1/2) - psi(i-1/2, j-1/2))/dy
    state.aux[0] = (psi[:-1, 1:] - psi[:-1, :-1]) / dy
    # v(i, j-1/2) = -(psi(i+1/2, j-1/2) - psi(i-1/2, j-1/2))/dx
    state.aux[1] = -(psi[1:, :-1] - psi[:-1, :-1]) / dx

    x, y = domain.grid.c_centers
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.75) ** 2)
    state.q[0] = np.where(r < 0.15, 1.0, 0.0)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 2.0
    claw.num_output_times = 8
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
