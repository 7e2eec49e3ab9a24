"""2D p-system with gauges (reference examples/psystem_2d/): radial
strain pulse in a (optionally layered) elastic medium, gauge time series
at fixed points."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=100, my=100, layered=False, kernel_language="xla",
          outdir="./_output"):
    solver = pyclaw.ClawSolver2D(riemann.psystem_2D)
    solver.fwave = True
    # no transverse splitter for the heterogeneous p-system: Godunov split
    solver.dimensional_split = True
    solver.limiters = [pyclaw.limiters.tvd.MC]
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap] * 2
    solver.aux_bc_upper = [pyclaw.BC.extrap] * 2

    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, 3, num_aux=2)
    state.problem_data["stress_relation"] = "exp"

    x, y = domain.grid.c_centers
    if layered:
        layer = (np.floor(4.0 * (y + 1.0)) % 2) == 0
        state.aux[0] = np.where(layer, 4.0, 1.0)
        state.aux[1] = np.where(layer, 4.0, 1.0)
    else:
        state.aux[0] = 1.0
        state.aux[1] = 1.0

    r2 = x ** 2 + y ** 2
    state.q[0] = 0.5 * np.exp(-50.0 * r2)
    state.q[1] = 0.0
    state.q[2] = 0.0

    domain.grid.add_gauges([[0.5, 0.0], [0.0, 0.75]])

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 1.0
    claw.num_output_times = 5
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
