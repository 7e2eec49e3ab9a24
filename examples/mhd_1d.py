"""Brio-Wu MHD shock tube (reference riemann mhd_1D solver; SURVEY.md
§2.8 long tail): gamma=2, Bx=0.75, left (rho=1, p=1, By=1), right
(rho=0.125, p=0.1, By=-1).  The solution develops the classic 5-feature
structure including the slow compound wave."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=800, gamma=2.0, bx=0.75, kernel_language="xla",
          solver_type="classic", outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.mhd_1D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.mhd_1D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, 7)
    state.problem_data["gamma"] = gamma
    state.problem_data["bx"] = bx

    x = domain.grid.x.centers
    left = x < 0.5
    rho = np.where(left, 1.0, 0.125)
    p = np.where(left, 1.0, 0.1)
    by = np.where(left, 1.0, -1.0)
    state.q[0] = rho
    state.q[1] = 0.0
    state.q[2] = 0.0
    state.q[3] = 0.0
    state.q[4] = by
    state.q[5] = 0.0
    state.q[6] = p / (gamma - 1.0) + 0.5 * (bx ** 2 + by ** 2)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.1
    claw.num_output_times = 5
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
