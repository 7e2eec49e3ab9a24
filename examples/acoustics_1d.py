"""1D homogeneous acoustics (reference
examples/acoustics_1d_homogeneous/acoustics_1d.py; BASELINE cfg2).
Pressure pulse in the middle; wall BC on the left, extrap on the right."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=100, kernel_language="xla", solver_type="classic",
          time_integrator="SSP104", outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.acoustics_1D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.acoustics_1D)
        solver.time_integrator = time_integrator
    solver.backend = kernel_language
    solver.bc_lower[:] = [pyclaw.BC.wall]
    solver.bc_upper[:] = [pyclaw.BC.extrap]

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    rho, bulk = 1.0, 1.0
    state.problem_data["rho"] = rho
    state.problem_data["bulk"] = bulk
    state.problem_data["zz"] = np.sqrt(rho * bulk)
    state.problem_data["cc"] = np.sqrt(bulk / rho)

    x = domain.grid.x.centers
    beta, x0 = 100.0, 0.75
    state.q[0, :] = np.exp(-beta * (x - x0) ** 2)
    state.q[1, :] = 0.0

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
