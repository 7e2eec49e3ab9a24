"""2D shallow water over a submerged bathymetry bump (reference
examples/shallow_2d class of problems, GeoClaw-style sw_aug solver):
the well-balanced 2D f-wave solver (riemann.sw_aug_2D /
shallow_bathymetry_fwave_2D) keeps the lake-at-rest state machine-still
over the bump while a small free-surface perturbation radiates across
it — the classic "perturbation over an ocean ridge" benchmark
(LeVeque & George)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=150, my=150, perturb=0.01, kernel_language="xla",
          outdir="./_output", dtype=None):
    solver = pyclaw.ClawSolver2D(riemann.sw_aug_2D)
    solver.fwave = True
    solver.limiters = [pyclaw.limiters.tvd.minmod]
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap] * 2
    solver.aux_bc_upper = [pyclaw.BC.extrap] * 2

    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, 3, num_aux=1, dtype=dtype)
    state.problem_data["grav"] = 9.8

    x, y = domain.grid.c_centers
    b = 0.5 * np.exp(-10.0 * (x ** 2 + y ** 2))        # submerged ridge
    state.aux[0] = b
    eta = 1.0 + perturb * np.exp(-100.0 * ((x + 0.5) ** 2 + y ** 2))
    state.q[0] = eta - b
    state.q[1] = 0.0
    state.q[2] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.3
    claw.num_output_times = 3
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
