"""2D acoustics across a material interface (reference
examples/acoustics_2d_variable/acoustics_2d_interface.py): a radial
pressure pulse in the left medium hits a vertical impedance jump at x=0 —
partial transmission/refraction.  Exercises the variable-coefficient
NORMAL solver (rpn2_vc_acoustics) *and* the heterogeneous transverse
splitter (rpt2_vc_acoustics) in the full unsplit CTU sweep."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=200, my=200, kernel_language="xla", solver_type="classic",
          rhol=4.0, cl=0.5, rhor=1.0, cr=1.0, dimensional_split=False,
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver2D(riemann.vc_acoustics_2D)
        solver.dimensional_split = dimensional_split
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver2D(riemann.vc_acoustics_2D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap] * 2
    solver.aux_bc_upper = [pyclaw.BC.extrap] * 2

    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, 3, num_aux=2)

    X, Y = domain.grid.c_centers
    zl, zr = rhol * cl, rhor * cr
    state.aux[0] = np.where(X < 0.0, zl, zr)        # impedance Z
    state.aux[1] = np.where(X < 0.0, cl, cr)        # sound speed c

    # radial pressure pulse centered in the left medium
    r = np.sqrt((X + 0.5) ** 2 + Y ** 2)
    width, rad = 0.10, 0.25
    state.q[0] = (np.abs(r - rad) <= width) * \
        (1.0 + np.cos(np.pi * (r - rad) / width))
    state.q[1] = 0.0
    state.q[2] = 0.0

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
