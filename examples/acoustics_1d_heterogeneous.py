"""1D acoustics across a material interface (reference
examples/acoustics_1d_heterogeneous/): pulse hits an impedance jump —
partial transmission/reflection with classical coefficients."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=800, kernel_language="xla", solver_type="classic",
          zl=1.0, cl=1.0, zr=4.0, cr=0.5, outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.acoustics_variable_1D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.acoustics_variable_1D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-1.0], [1.0], [nx])
    state = pyclaw.State(domain, 2, num_aux=2)

    x = domain.grid.x.centers
    state.aux[0, :] = np.where(x < 0.0, zl, zr)     # impedance
    state.aux[1, :] = np.where(x < 0.0, cl, cr)     # sound speed

    # right-going pulse in the left medium: p = Z u
    pulse = np.exp(-200.0 * (x + 0.5) ** 2)
    state.q[0, :] = pulse
    state.q[1, :] = pulse / zl

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.8
    claw.num_output_times = 8
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
