"""2D shallow-water radial dam break (reference
examples/shallow_2d/radial_dam_break.py; BASELINE cfg3)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=125, my=125, kernel_language="xla", solver_type="classic",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver2D(riemann.shallow_roe_with_efix_2D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver2D(riemann.shallow_roe_with_efix_2D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-2.5, -2.5], [2.5, 2.5], [mx, my])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["grav"] = 1.0

    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    state.q[0, :, :] = np.where(r <= 0.5, 2.0, 1.0)
    state.q[1, :, :] = 0.0
    state.q[2, :, :] = 0.0

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
