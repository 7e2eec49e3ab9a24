"""Shallow water flow over a bathymetry sill (reference
examples/shallow_1d/sill.py): well-balanced f-wave solver with topography
source built into the flux decomposition — the lake-at-rest equilibrium
is preserved EXACTLY, and small perturbations propagate cleanly over the
bump."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def bathymetry(x):
    return 0.8 * np.exp(-x ** 2 / 0.2)


def setup(nx=500, perturb=1e-3, kernel_language="xla", outdir="./_output"):
    solver = pyclaw.ClawSolver1D(riemann.shallow_bathymetry_fwave_1D)
    solver.fwave = True
    solver.limiters = [pyclaw.limiters.tvd.vanleer]
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap
    solver.aux_bc_lower = [pyclaw.BC.extrap]
    solver.aux_bc_upper = [pyclaw.BC.extrap]

    domain = pyclaw.Domain([-1.0], [1.0], [nx])
    state = pyclaw.State(domain, 2, num_aux=1)
    state.problem_data["grav"] = 9.8

    x = domain.grid.x.centers
    state.aux[0, :] = bathymetry(x)
    # lake at rest: surface eta = h + b = 1, plus a small pressure pulse
    state.q[0, :] = 1.0 - state.aux[0, :] \
        + perturb * np.exp(-1000.0 * (x + 0.6) ** 2)
    state.q[1, :] = 0.0

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.4
    claw.num_output_times = 4
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
