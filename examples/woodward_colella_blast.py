"""Woodward-Colella interacting blast waves (reference
examples/euler_1d/woodward_colella_blast.py): 1D Euler, two strong blasts
between reflecting walls.  The wall BCs are applied through CUSTOM user
callbacks (exercising solver.user_bc_lower/upper like the reference)."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def wall_bc_lower(state, dim, t, qbc, auxbc, num_ghost):
    """Reflecting wall via custom callback: mirror cells, negate
    momentum (jax-traceable, functional)."""
    import jax.numpy as jnp
    g = num_ghost
    band = qbc[:, g:2 * g][:, ::-1]
    band = band.at[1].multiply(-1.0)
    return qbc.at[:, :g].set(band)


def wall_bc_upper(state, dim, t, qbc, auxbc, num_ghost):
    import jax.numpy as jnp
    g = num_ghost
    band = qbc[:, -2 * g:-g][:, ::-1]
    band = band.at[1].multiply(-1.0)
    return qbc.at[:, -g:].set(band)


def setup(nx=800, kernel_language="xla", solver_type="sharpclaw",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.euler_with_efix_1D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.euler_with_efix_1D)
        solver.time_integrator = "SSP33"
    solver.backend = kernel_language
    solver.bc_lower = [pyclaw.BC.custom]
    solver.bc_upper = [pyclaw.BC.custom]
    solver.user_bc_lower = wall_bc_lower
    solver.user_bc_upper = wall_bc_upper

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    gamma = 1.4
    state.problem_data["gamma"] = gamma

    x = domain.grid.x.centers
    p = np.where(x < 0.1, 1000.0, np.where(x > 0.9, 100.0, 0.01))
    state.q[0, :] = 1.0
    state.q[1, :] = 0.0
    state.q[2, :] = p / (gamma - 1.0)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.038
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
