"""Variable-coefficient 1D advection (reference
examples/advection_1d_variable/): edge velocities in aux, optional
capacity function kappa = 1/u (turning the conservative solve into the
color equation), optional f-wave formulation."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def velocity(x):
    return 1.0 + 0.5 * np.sin(2 * np.pi * x)


def setup(nx=200, kernel_language="xla", solver_type="classic",
          use_capacity=False, use_fwave=False, outdir="./_output"):
    rs = (riemann.vc_advection_fwave_1D if use_fwave
          else riemann.vc_advection_1D)
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(rs)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(rs)
    solver.fwave = use_fwave
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.periodic
    solver.aux_bc_lower = [pyclaw.BC.periodic]
    solver.aux_bc_upper = [pyclaw.BC.periodic]

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    num_aux = 2 if use_capacity else 1
    state = pyclaw.State(domain, 1, num_aux=num_aux)

    if use_fwave:
        # conservative form: cell-centered velocities
        state.aux[0, :] = velocity(domain.grid.x.centers)
    else:
        # color equation: edge velocities (lower edge of each cell)
        state.aux[0, :] = velocity(domain.grid.x.edges[:-1])
    if use_capacity:
        centers = domain.grid.x.centers
        state.aux[1, :] = 1.0 / velocity(centers)
        state.index_capa = 1

    x = domain.grid.x.centers
    state.q[0, :] = np.exp(-100.0 * (x - 0.3) ** 2)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.5
    claw.num_output_times = 5
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
