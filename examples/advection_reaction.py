"""Advection-reaction: q_t + u q_x = -lambda q (reference
examples/advection_reaction_2d spirit, 1D).  Exact solution
q(x,t) = exp(-lambda t) q0(x - u t): exercises the source-term hooks —
classic ``step_source`` with Godunov/Strang splitting and SharpClaw's
semidiscrete ``dq_src``."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(nx=200, lam=1.0, solver_type="classic", source_split=2,
          kernel_language="xla", outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver1D(riemann.advection_1D)
        solver.limiters = [pyclaw.limiters.tvd.MC]
        solver.source_split = source_split

        def step_source(solver, state, q, dt):
            # exact integrator of q_t = -lam q over dt (jax-traceable)
            import jax.numpy as jnp
            return q * jnp.exp(-lam * dt)

        solver.step_source = step_source
    else:
        solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)

        def dq_src(solver, state, q, dt, t):
            return -lam * q

        solver.dq_src = dq_src
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.periodic

    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0

    x = domain.grid.x.centers
    state.q[0, :] = np.exp(-100.0 * (x - 0.5) ** 2)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 1.0
    claw.num_output_times = 5
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup)
