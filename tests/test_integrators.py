"""SharpClaw time integrators: RK (Butcher tableau), SSPLMMk2/k3
(reference sharpclaw/solver.py time_integrator family) — convergence and
agreement oracles on smooth advection."""

import numpy as np
import pytest

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _run(time_integrator, nx=64, dt=None, tfinal=1.0, **solver_attrs):
    solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)
    solver.time_integrator = time_integrator
    solver.all_bcs = pyclaw.BC.periodic
    for k, v in solver_attrs.items():
        setattr(solver, k, v)
    if dt is not None:
        solver.dt_variable = False
        solver.dt_initial = dt
    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0
    x = domain.grid.x.centers
    state.q[0, :] = np.sin(2 * np.pi * x)
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = tfinal
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    err = np.max(np.abs(claw.solution.q[0] - np.sin(2 * np.pi * x)))
    return err, claw


def test_rk4_tableau():
    """Classical RK4 via the generic 'RK' branch matches SSP104 accuracy
    class (both 4th order) on smooth advection."""
    A = [[0, 0, 0, 0],
         [0.5, 0, 0, 0],
         [0, 0.5, 0, 0],
         [0, 0, 1.0, 0]]
    b = [1 / 6, 1 / 3, 1 / 3, 1 / 6]
    err_rk4, _ = _run("RK", dt=1.0 / 256, a=A, b=b)
    err_ssp, _ = _run("SSP104", dt=1.0 / 256)
    # both are 4th order; spatial error (WENO5, nx=64) dominates, so the
    # two integrators give near-identical results
    assert abs(err_rk4 - err_ssp) < 0.2 * max(err_rk4, err_ssp) + 1e-8, \
        (err_rk4, err_ssp)


def test_rk_missing_tableau_raises():
    with pytest.raises(ValueError):
        _run("RK", dt=0.01)


@pytest.mark.parametrize("integrator,order", [("SSPLMMk2", 2),
                                              ("SSPLMMk3", 3)])
def test_ssplmm_convergence(integrator, order):
    """Temporal convergence at the design order: fix a fine spatial grid,
    halve dt, error ratio ~ 2^order (error dominated by time integration
    at these dt)."""
    # dt must respect the LMM SSP bound (C=2/3 resp. 1/3 of the FE limit
    # dx/u).  Compare against a same-grid SSP104 tiny-dt reference so the
    # WENO5 spatial error cancels and the pure temporal rate shows.
    _, claw_ref = _run("SSP104", nx=128, dt=1.0 / 4800)
    q_ref = claw_ref.solution.q[0].copy()
    errs = []
    for dt in (1.0 / 600, 1.0 / 1200):
        _, claw = _run(integrator, nx=128, dt=dt, lmm_steps=4)
        errs.append(np.max(np.abs(claw.solution.q[0] - q_ref)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.45, (errs, rate)


@pytest.mark.parametrize("integrator", ["SSPLMMk2", "SSPLMMk3"])
def test_ssplmm_variable_dt(integrator):
    """SSPLMM with ADAPTIVE dt (reference step-ratio machinery,
    omega-dependent coefficients): CFL-driven dt, SSP-coefficient CFL
    defaults, stays accurate vs the exact advected profile."""
    solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)
    solver.time_integrator = integrator
    solver.lmm_steps = 5
    solver.dt_variable = True
    solver.dt_initial = 1e-4           # adapts upward via CFL
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0], [1.0], [128])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0
    x = domain.grid.x.centers
    state.q[0] = np.sin(2 * np.pi * x) ** 4
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 1.0
    claw.num_output_times = 2
    claw.output_format = None
    claw.run()
    # CFL defaults: half the SSP coefficient C = (k-order)/(k-1)
    order = 2 if integrator == "SSPLMMk2" else 3
    assert abs(solver.cfl_max - 0.5 * (5 - order) / 4) < 1e-12
    q = np.asarray(claw.solution.q[0])
    exact = np.sin(2 * np.pi * x) ** 4   # full period: back to the IC
    err = np.abs(q - exact).max()
    assert err < 0.02, err
    assert solver.status["dtmin"] < solver.status["dtmax"]  # dt adapted


def test_generic_lmm_ab3():
    """time_integrator='LMM' with Adams-Bashforth-3 coefficients
    (oldest-first): 3rd-order temporal convergence vs a tiny-dt SSP104
    reference on the same grid."""
    ab3 = dict(lmm_alpha=[0.0, 0.0, 1.0],
               lmm_beta=[5.0 / 12.0, -16.0 / 12.0, 23.0 / 12.0])
    _, claw_ref = _run("SSP104", nx=128, dt=1.0 / 4800)
    q_ref = claw_ref.solution.q[0].copy()
    errs = []
    for dt in (1.0 / 600, 1.0 / 1200):
        _, claw = _run("LMM", nx=128, dt=dt, **ab3)
        errs.append(np.max(np.abs(claw.solution.q[0] - q_ref)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.55, (errs, rate)


def test_lmm_missing_coeffs_raises():
    with pytest.raises(ValueError, match="lmm_alpha"):
        _run("LMM", dt=0.01)


def test_lmm_requires_fixed_dt():
    solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)
    solver.time_integrator = "LMM"
    solver.lmm_alpha = [0.0, 1.0]
    solver.lmm_beta = [-0.5, 1.5]
    solver.dt_variable = True
    domain = pyclaw.Domain([0.0], [1.0], [16])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0
    state.q[0] = 0.0
    with pytest.raises(ValueError, match="dt_variable"):
        solver.setup(pyclaw.Solution(state, domain))


def test_lmm_inconsistent_alpha_raises():
    with pytest.raises(ValueError, match="sum to 1"):
        _run("LMM", dt=0.01, lmm_alpha=[0.5, 0.0], lmm_beta=[0.0, 1.0])
