"""Stegotons: solitary waves in periodic layered media (reference
examples/stegoton_1d/stegoton.py).  Nonlinear p-system with piecewise-
constant (rho, K) alternating layers, f-wave solver."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=1200, cells_per_layer=24, kernel_language="xla",
          solver_type="classic", outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.psystem_1D)
        solver.limiters = [pyclaw.limiters.tvd.vanleer]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.psystem_1D)
    solver.fwave = True
    solver.all_bcs = pyclaw.BC.periodic
    solver.aux_bc_lower = [pyclaw.BC.periodic]
    solver.aux_bc_upper = [pyclaw.BC.periodic]

    xmax = nx / cells_per_layer  # one layer pair per 2 units
    domain = pyclaw.Domain([0.0], [xmax], [nx])
    state = pyclaw.State(domain, 2, num_aux=2)

    x = domain.grid.x.centers
    # alternating layers: (rho, K) = (4, 4) / (1, 1), period 2
    layer = (x % 2.0) < 1.0
    state.aux[0, :] = np.where(layer, 4.0, 1.0)
    state.aux[1, :] = np.where(layer, 4.0, 1.0)
    state.problem_data["stress_relation"] = "exp"

    # initial strain pulse
    state.q[0, :] = 2.0 * np.exp(-((x - xmax / 2) ** 2) / 5.0)
    state.q[1, :] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 20.0
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
