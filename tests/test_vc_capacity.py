"""Variable-coefficient advection + capacity-function (kappa) + f-wave
paths (reference advection_1d_variable example; SURVEY.md §2.8 fwave and
index_capa machinery).

Characteristics oracle: dx/dt integrated backward with RK4.
Color equation (edge velocities, wave form):   q(x,t) = q0(xi), speed u(x).
Conservative form (center velocities, fwave):  q(x,t) = q0(xi) u(xi)/u(x),
exact telescoping conservation.
Capacity form kappa q_t + q_x = 0 (u=1, fwave): speed 1/kappa(x), exact
conservation of the kappa-weighted mass.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from advection_1d_variable import setup, velocity  # noqa: E402


def _trace_back(x, t, speed, n_steps=4000):
    """RK4-integrate dx/ds = -speed(x) for time t on the periodic unit
    interval (backward characteristics)."""
    h = t / n_steps
    xi = np.array(x, dtype=float)
    for _ in range(n_steps):
        k1 = -speed(xi)
        k2 = -speed(xi + 0.5 * h * k1)
        k3 = -speed(xi + 0.5 * h * k2)
        k4 = -speed(xi + h * k3)
        xi = xi + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return xi % 1.0


def _ic(x):
    d = (x - 0.3) % 1.0
    d = np.minimum(d, 1.0 - d)
    return np.exp(-100.0 * d ** 2)


def test_color_equation():
    claw = setup(nx=400, outdir=None)
    claw.run()
    q = claw.solution.q[0]
    x = claw.solution.domain.grid.x.centers
    xi = _trace_back(x, claw.solution.t, velocity)
    exact = _ic(xi)
    l1 = np.mean(np.abs(q - exact)) / np.mean(np.abs(exact))
    assert l1 < 0.03, l1
    # color property: max principle
    assert q.max() <= 1.0 + 1e-10
    assert q.min() >= -1e-10


def test_conservative_fwave():
    claw = setup(nx=400, use_fwave=True, outdir=None)
    mass0 = claw.solution.q[0].sum()
    claw.run()
    q = claw.solution.q[0]
    # fwave telescoping: exact conservation
    np.testing.assert_allclose(q.sum(), mass0, rtol=1e-12)
    x = claw.solution.domain.grid.x.centers
    xi = _trace_back(x, claw.solution.t, velocity)
    exact = _ic(xi) * velocity(xi) / velocity(x)
    l1 = np.mean(np.abs(q - exact)) / np.mean(np.abs(exact))
    assert l1 < 0.03, l1


def test_capacity_function():
    """kappa(x) q_t + q_x = 0 via the fwave solver with u=1 and
    index_capa: transport at speed 1/kappa, exact kappa-mass
    conservation."""
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann

    def kappa_fn(x):
        return 2.0 + np.sin(2 * np.pi * x)

    nx = 400
    solver = pyclaw.ClawSolver1D(riemann.vc_advection_fwave_1D)
    solver.fwave = True
    solver.limiters = [pyclaw.limiters.tvd.MC]
    solver.all_bcs = pyclaw.BC.periodic
    solver.aux_bc_lower = [pyclaw.BC.periodic]
    solver.aux_bc_upper = [pyclaw.BC.periodic]
    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, 1, num_aux=2)
    xc = domain.grid.x.centers
    state.aux[0, :] = 1.0               # unit velocity -> flux = q
    state.aux[1, :] = kappa_fn(xc)
    state.index_capa = 1
    state.q[0, :] = _ic(xc)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.5
    claw.num_output_times = 1
    claw.output_format = None
    kmass0 = (state.aux[1] * state.q[0]).sum()
    claw.run()
    q = claw.solution.q[0]
    np.testing.assert_allclose((state.aux[1] * q).sum(), kmass0, rtol=1e-12)
    xi = _trace_back(xc, claw.solution.t, lambda x: 1.0 / kappa_fn(x))
    exact = _ic(xi)
    l1 = np.mean(np.abs(q - exact)) / np.mean(np.abs(exact))
    assert l1 < 0.03, l1


def test_capacity_decomposition_invariance():
    """index_capa + aux must survive domain decomposition (aux is haloed
    too)."""
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import parallel, riemann

    def build(par):
        rs = riemann.vc_advection_1D
        solver = (parallel.ClawSolver1D(rs) if par
                  else pyclaw.ClawSolver1D(rs))
        solver.all_bcs = pyclaw.BC.periodic
        solver.aux_bc_lower = [pyclaw.BC.periodic]
        solver.aux_bc_upper = [pyclaw.BC.periodic]
        domain = pyclaw.Domain([0.0], [1.0], [160])
        state = pyclaw.State(domain, 1, num_aux=2)
        edges = domain.grid.x.edges[:-1]
        state.aux[0, :] = velocity(edges)
        state.aux[1, :] = 1.0 / velocity(domain.grid.x.centers)
        state.index_capa = 1
        state.q[0, :] = _ic(domain.grid.x.centers)
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = 0.2
        claw.num_output_times = 1
        claw.output_format = None
        return claw

    claw_s = build(False)
    claw_s.run()
    claw_p = build(True)
    claw_p.run()
    np.testing.assert_allclose(claw_p.solution.q, claw_s.solution.q,
                               atol=1e-13)
