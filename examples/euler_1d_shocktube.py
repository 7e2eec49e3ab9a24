"""Sod shock tube (reference examples/euler_1d/shocktube.py; BASELINE
cfg2): 1D Euler with the classic Roe+entropy-fix solver or SharpClaw
WENO5."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=800, kernel_language="xla", solver_type="sharpclaw",
          time_integrator="SSP104", char_decomp=0, outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.euler_with_efix_1D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.euler_with_efix_1D)
        solver.time_integrator = time_integrator
        solver.char_decomp = char_decomp
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-0.5], [0.5], [nx])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    gamma = 1.4
    state.problem_data["gamma"] = gamma

    x = domain.grid.x.centers
    rho = np.where(x < 0.0, 1.0, 0.125)
    p = np.where(x < 0.0, 1.0, 0.1)
    state.q[0, :] = rho
    state.q[1, :] = 0.0
    state.q[2, :] = p / (gamma - 1.0)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.2
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
