"""Dam break onto a dry sloping beach — wetting/drying with the
augmented solver (reference GeoClaw-class sw_aug; SURVEY.md §2.8 long
tail).  A column of water collapses, runs up a dry beach, and drains
back: depths stay nonnegative through both the wetting and the drying
front, and the shoreline (where the beach rises above the surface) acts
as a moving wall.  `dimension=2` runs the radial analog on a 2D plane
beach."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=500, dimension=1, outdir="./_output"):
    if dimension == 1:
        solver = pyclaw.ClawSolver1D(riemann.sw_aug_1D)
        domain = pyclaw.Domain([-5.0], [5.0], [nx])
    else:
        solver = pyclaw.ClawSolver2D(riemann.sw_aug_2D)
        # donor-cell corners: CTU transverse corrections are not
        # positivity-preserving over wetting/drying fronts (GeoClaw
        # clips the tiny negatives they create; we keep exact h >= 0
        # by dropping them — robustness over corner accuracy)
        solver.transverse_waves = 0
        domain = pyclaw.Domain([-5.0, -5.0], [5.0, 5.0], [nx, nx])
    solver.fwave = True
    solver.limiters = [pyclaw.limiters.tvd.minmod]
    solver.cfl_desired = 0.4
    solver.cfl_max = 0.45
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap] * dimension
    solver.aux_bc_upper = [pyclaw.BC.extrap] * dimension

    state = pyclaw.State(domain, solver.rp.num_eqn, num_aux=1)
    state.problem_data["grav"] = 9.8
    state.problem_data["dry_tolerance"] = 1e-5

    if dimension == 1:
        x = domain.grid.x.centers
        beach = np.maximum(0.0, 0.4 * (x - 1.0))       # dry beach x > 1
        state.aux[0] = beach
        state.q[0] = np.where(x < 0.0, 1.0, 0.0)       # dam at x = 0
        state.q[1] = 0.0
    else:
        x, y = domain.grid.c_centers
        r = np.sqrt(x ** 2 + y ** 2)
        state.aux[0] = np.maximum(0.0, 0.4 * (r - 1.0))
        state.q[0] = np.where(r < 0.5, 1.0, 0.0)
        state.q[1] = 0.0
        state.q[2] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 2.0
    claw.num_output_times = 4
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
