"""1D Burgers equation (reference examples/burgers_1d/): sine wave
steepening into a shock, periodic BCs."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=500, kernel_language="xla", solver_type="classic",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.burgers_1D)
        solver.limiters = [pyclaw.limiters.tvd.vanleer]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.burgers_1D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.periodic

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["efix"] = True

    x = domain.grid.x.centers
    state.q[0, :] = np.sin(2 * np.pi * x) + 0.5

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.5
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
