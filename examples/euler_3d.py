"""3D Euler smooth pressure-pulse / Sedov-like test (reference
examples/euler_3d/Sedov.py; BASELINE cfg5 — the multi-host partitioned
workload)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=32, my=32, mz=32, kernel_language="xla", solver_type="classic",
          use_parallel=False, outdir="./_output", dtype=None):
    if solver_type == "classic":
        if use_parallel:
            from pyclaw_tpu import parallel
            solver = parallel.ClawSolver3D(riemann.euler_3D)
        else:
            solver = pyclaw.ClawSolver3D(riemann.euler_3D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        if use_parallel:
            from pyclaw_tpu import parallel
            solver = parallel.SharpClawSolver3D(riemann.euler_3D)
        else:
            solver = pyclaw.SharpClawSolver3D(riemann.euler_3D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                           [mx, my, mz])
    state = pyclaw.State(domain, solver.rp.num_eqn, dtype=dtype)
    gamma = 1.4
    state.problem_data["gamma"] = gamma

    x, y, z = domain.grid.c_centers
    r2 = x ** 2 + y ** 2 + z ** 2
    p = 0.1 + 5.0 * np.exp(-40.0 * r2)      # smooth energy deposition
    state.q[0] = 1.0
    state.q[1] = 0.0
    state.q[2] = 0.0
    state.q[3] = 0.0
    state.q[4] = p / (gamma - 1.0)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.2
    claw.num_output_times = 2
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
