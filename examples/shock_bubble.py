"""2D Euler shock-bubble interaction with passive tracer (reference
examples/euler_2d/shock_bubble_interaction.py): a Mach shock hits a
low-density bubble; the 5-wave solver advects a tracer marking the
bubble."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=320, my=80, kernel_language="xla", solver_type="classic",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver2D(riemann.euler_5wave_2D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver2D(riemann.euler_5wave_2D)
    solver.backend = kernel_language
    solver.bc_lower = [pyclaw.BC.extrap, pyclaw.BC.wall]
    solver.bc_upper = [pyclaw.BC.extrap, pyclaw.BC.extrap]

    domain = pyclaw.Domain([0.0, 0.0], [2.0, 0.5], [mx, my])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    gamma = 1.4
    state.problem_data["gamma"] = gamma

    x, y = domain.grid.c_centers
    r = np.sqrt((x - 0.5) ** 2 + y ** 2)
    in_bubble = r < 0.2

    # pre-shock ambient / post-shock left state (Mach ~2.0 shock at x=0.2)
    rho = np.where(x < 0.2, 2.6667, 1.0)
    u = np.where(x < 0.2, 1.25, 0.0)
    p = np.where(x < 0.2, 4.5, 1.0)
    rho = np.where(in_bubble, 0.1, rho)

    state.q[0] = rho
    state.q[1] = rho * u
    state.q[2] = 0.0
    state.q[3] = p / (gamma - 1.0) + 0.5 * rho * u ** 2
    state.q[4] = rho * in_bubble          # tracer marks the bubble

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.6
    claw.num_output_times = 6
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
