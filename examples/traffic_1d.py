"""LWR traffic flow (reference examples/traffic/): red-light Riemann
problem — left queue dissolving into a rarefaction, shock on the right."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=500, kernel_language="xla", solver_type="classic",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.traffic_1D)
        solver.limiters = [pyclaw.limiters.tvd.vanleer]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.traffic_1D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-1.0], [1.0], [nx])
    state = pyclaw.State(domain, 1)
    state.problem_data["umax"] = 1.0

    x = domain.grid.x.centers
    state.q[0, :] = 0.75 * (x < 0.0) + 0.1 * (x >= 0.0)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 1.0
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
