"""Corner-transport-upwind exactness oracle: for constant-velocity
advection at first order, the unsplit CTU scheme (with all transverse /
double-transverse terms) must reproduce the EXACT product-form upwind
update

    Q^{n+1} = prod_d [(1 - nu_d) + nu_d S_d^{-sign}] Q^n

to roundoff in one step.  This pins down every transverse scatter index
and the rptt3 coefficients (dt^2/(6 dx dy) with the (1-S^-) differencing).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _product_form(q, nus):
    """exact one-step update for constant advection, |nu_d| <= 1."""
    out = q.copy()
    for d, nu in enumerate(nus):
        shift = 1 if nu > 0 else -1
        out = (1.0 - abs(nu)) * out + abs(nu) * np.roll(out, shift, axis=d)
    return out


@pytest.mark.parametrize("vels", [(1.0, 0.5), (1.0, -0.5), (-0.7, -0.3)])
def test_ctu2d_exact_one_step(vels):
    u, v = vels
    n = 16
    solver = pyclaw.ClawSolver2D(riemann.advection_2D)
    solver.order = 1
    solver.transverse_waves = 2
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [n, n])
    state = pyclaw.State(domain, 1)
    state.problem_data.update(u=u, v=v)
    rng = np.random.default_rng(0)
    state.q[0] = rng.standard_normal((n, n))
    solver.setup(pyclaw.Solution(state, domain))

    dt = 0.4 / n
    q_new, cfl = solver._step_fn(jnp.asarray(state.q), None, dt, 0.0)
    nus = (u * dt * n, v * dt * n)
    expected = _product_form(state.q[0], nus)
    np.testing.assert_allclose(np.asarray(q_new[0]), expected, atol=1e-13)


@pytest.mark.parametrize("vels", [(1.0, 0.5, 0.25),
                                  (1.0, -0.5, 0.25),
                                  (-0.6, 0.4, -0.8)])
def test_ctu3d_exact_one_step(vels):
    u, v, w = vels
    n = 10
    solver = pyclaw.ClawSolver3D(riemann.advection_3D)
    solver.dimensional_split = False
    solver.order = 1
    solver.transverse_waves = 2
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0] * 3, [1.0] * 3, [n] * 3)
    state = pyclaw.State(domain, 1)
    state.problem_data.update(u=u, v=v, w=w)
    rng = np.random.default_rng(1)
    state.q[0] = rng.standard_normal((n, n, n))
    solver.setup(pyclaw.Solution(state, domain))

    dt = 0.5 / n
    q_new, cfl = solver._step_fn(jnp.asarray(state.q), None, dt, 0.0)
    nus = (u * dt * n, v * dt * n, w * dt * n)
    expected = _product_form(state.q[0], nus)
    np.testing.assert_allclose(np.asarray(q_new[0]), expected, atol=1e-13)


def test_ctu3d_unsplit_stable_high_cfl():
    """With the double-transverse terms the unsplit 3D method is stable at
    per-dim CFL 0.9 (it blows up without them — Langseth & LeVeque) and
    converges under refinement."""
    errs = []
    for n in (24, 48):
        solver = pyclaw.ClawSolver3D(riemann.advection_3D)
        solver.dimensional_split = False
        solver.limiters = [0]
        solver.cfl_desired, solver.cfl_max = 0.9, 1.0
        solver.all_bcs = pyclaw.BC.periodic
        domain = pyclaw.Domain([0.0] * 3, [1.0] * 3, [n] * 3)
        state = pyclaw.State(domain, 1)
        state.problem_data.update(u=1.0, v=0.5, w=0.25)
        x, y, z = domain.grid.c_centers
        state.q[0] = (np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y)
                      * np.sin(2 * np.pi * z))
        q0 = state.q[0].copy()
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = 4.0
        claw.num_output_times = 1
        claw.output_format = None
        claw.run()
        errs.append(np.max(np.abs(claw.solution.q[0] - q0))
                    / np.max(np.abs(q0)))
    # stable (no blow-up) and ~2nd-order convergent
    assert errs[1] < 1.0, errs
    assert errs[1] < errs[0] / 3.0, errs
