"""1D linear advection (reference examples/advection_1d/advection_1d.py
:~1-90; BASELINE cfg1).  q_t + u q_x = 0 on [0,1], Gaussian pulse IC,
periodic BCs; after t = 1/u the exact solution equals the IC."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=100, kernel_language="xla", use_petsc=False,
          solver_type="classic", weno_order=5, time_integrator="SSP104",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.advection_1D)
        solver.limiters = [pyclaw.limiters.tvd.vanleer]
    elif solver_type == "sharpclaw":
        solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)
        solver.weno_order = weno_order
        solver.time_integrator = time_integrator
    else:
        raise ValueError(f"bad solver_type {solver_type}")
    solver.backend = kernel_language
    solver.bc_lower[:] = [pyclaw.BC.periodic]
    solver.bc_upper[:] = [pyclaw.BC.periodic]

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["u"] = 1.0

    x = domain.grid.x.centers
    beta, x0 = 100.0, 0.75
    state.q[0, :] = np.exp(-beta * (x - x0) ** 2)

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
