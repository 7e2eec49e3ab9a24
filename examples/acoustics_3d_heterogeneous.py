"""3D acoustics in a layered medium (reference
examples/acoustics_3d_heterogeneous/acoustics_3d_interface.py): a
pressure pulse below a horizontal impedance interface at z=0 —
transmission/reflection in 3D.  Exercises the variable-coefficient
normal solver and the axis-generic heterogeneous transverse splitter in
the 3D unsplit sweep (pairwise CTU; the reference has no vc
double-transverse solver either)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=32, my=32, mz=32, kernel_language="xla",
          solver_type="classic", rho_bot=4.0, c_bot=0.5, rho_top=1.0,
          c_top=1.0, dimensional_split=False, outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver3D(riemann.vc_acoustics_3D)
        solver.dimensional_split = dimensional_split
        if not dimensional_split:
            solver.transverse_waves = 1     # no vc rptt3 (see module doc)
            solver.cfl_desired, solver.cfl_max = 0.45, 0.5
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver3D(riemann.vc_acoustics_3D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap] * 3
    solver.aux_bc_upper = [pyclaw.BC.extrap] * 3

    domain = pyclaw.Domain([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                           [mx, my, mz])
    state = pyclaw.State(domain, 4, num_aux=2)

    X, Y, Z = domain.grid.c_centers
    zb, zt = rho_bot * c_bot, rho_top * c_top
    state.aux[0] = np.where(Z < 0.0, zb, zt)      # impedance
    state.aux[1] = np.where(Z < 0.0, c_bot, c_top)  # sound speed

    r2 = X ** 2 + Y ** 2 + (Z + 0.5) ** 2
    state.q[0] = 5.0 * np.exp(-40.0 * r2)
    state.q[1] = 0.0
    state.q[2] = 0.0
    state.q[3] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.8
    claw.num_output_times = 4
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
