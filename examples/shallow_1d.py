"""1D shallow-water dam break (reference examples/shallow_1d/dam_break.py):
Riemann problem with the Roe+efix solver."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=500, kernel_language="xla", solver_type="classic",
          riemann_solver="roe", outdir="./_output"):
    rs = (riemann.shallow_roe_with_efix_1D if riemann_solver == "roe"
          else riemann.shallow_hlle_1D)
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(rs)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(rs)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-5.0], [5.0], [nx])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["grav"] = 1.0

    x = domain.grid.x.centers
    state.q[0, :] = np.where(x < 0.0, 3.0, 1.0)
    state.q[1, :] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 2.0
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
