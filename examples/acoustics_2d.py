"""2D homogeneous acoustics radial pulse (reference
examples/acoustics_2d_homogeneous/acoustics_2d.py; BASELINE cfg3).
Exercises rpn2/rpt2 transverse solves (classic) and 2D MOL (sharpclaw)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=100, my=100, kernel_language="xla", solver_type="classic",
          time_integrator="SSP104", dimensional_split=False,
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver2D(riemann.acoustics_2D)
        solver.dimensional_split = dimensional_split
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver2D(riemann.acoustics_2D)
        solver.time_integrator = time_integrator
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    rho, bulk = 1.0, 4.0
    state.problem_data["rho"] = rho
    state.problem_data["bulk"] = bulk
    state.problem_data["zz"] = np.sqrt(rho * bulk)
    state.problem_data["cc"] = np.sqrt(bulk / rho)

    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    width = 0.2
    state.q[0, :, :] = np.where(np.abs(r - 0.5) <= width,
                                1.0 + np.cos(np.pi * (r - 0.5) / width), 0.0)
    state.q[1, :, :] = 0.0
    state.q[2, :, :] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.12
    claw.num_output_times = 2
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
