"""Rigid-body rotation on an annulus — MAPPED grid (reference
examples/advection_2d_annulus/): computational coordinates (r, theta),
physical map x = r cos(theta), y = r sin(theta); capacity function
kappa = r (area element) and theta-face velocities u = omega * r so the
conservative vc f-wave solve transports at d(theta)/dt = omega on every
ring.  After t = 2*pi/omega the solution returns exactly to the IC."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def mapc2p(grid, r, theta):
    return r * np.cos(theta), r * np.sin(theta)


def setup(mr=40, mth=120, omega=1.0, kernel_language="xla",
          dimensional_split=True, outdir="./_output"):
    if dimensional_split:
        solver = pyclaw.ClawSolver2D(riemann.vc_advection_fwave_1D)
        solver.dimensional_split = True
    else:
        # unsplit CTU: rpt2_vc_advection-equivalent transverse splitter +
        # capacity-scaled corner-transport coefficients
        solver = pyclaw.ClawSolver2D(riemann.vc_advection_fwave_2D)
        solver.dimensional_split = False
    solver.fwave = True
    solver.limiters = [pyclaw.limiters.tvd.MC]
    solver.backend = kernel_language
    solver.bc_lower = [pyclaw.BC.extrap, pyclaw.BC.periodic]
    solver.bc_upper = [pyclaw.BC.extrap, pyclaw.BC.periodic]
    solver.aux_bc_lower = [pyclaw.BC.extrap, pyclaw.BC.periodic]
    solver.aux_bc_upper = [pyclaw.BC.extrap, pyclaw.BC.periodic]

    domain = pyclaw.Domain([0.2, 0.0], [1.0, 2.0 * np.pi], [mr, mth])
    domain.grid.mapc2p = mapc2p
    state = pyclaw.State(domain, 1, num_aux=3)

    r, th = domain.grid.c_centers
    # aux[0]: r-face normal velocity (0 — no radial flow)
    # aux[1]: theta-face velocity u = omega*r  (cell-centered for fwave)
    # aux[2]: capacity kappa = r (cell area / (dr dtheta))
    state.aux[0] = 0.0
    state.aux[1] = omega * r
    state.aux[2] = r
    state.index_capa = 2

    state.q[0] = np.exp(-40.0 * ((r - 0.6) ** 2)
                        - 6.0 * (np.cos(th) - 1.0) ** 2)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 2.0 * np.pi / omega
    claw.num_output_times = 4
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
