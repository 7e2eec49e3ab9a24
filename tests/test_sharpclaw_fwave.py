"""fwave-form Riemann solvers through the SharpClaw path (reference
flux1.f90 fwave branch; SURVEY.md §2.3): an f-wave solver returns
fluctuations that split the FLUX difference, so the same MOL assembly
telescopes exactly for spatially-varying conservative fluxes.  The
variable-coefficient conservative advection solver pins it:

  - mass conservation to roundoff on a periodic variable-velocity field,
  - agreement with the classic (fwave) solver on a smooth problem,
  - 5th-order-ish convergence of the WENO5 path on smooth data."""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _setup(solver_type, nx, tfinal=0.25, width=80.0):
    if solver_type == "sharpclaw":
        solver = pyclaw.SharpClawSolver1D(riemann.vc_advection_fwave_1D)
        solver.time_integrator = "SSP104"
        solver.lim_type = 2
    else:
        solver = pyclaw.ClawSolver1D(riemann.vc_advection_fwave_1D)
        solver.fwave = True
        solver.limiters = [0]
    solver.all_bcs = pyclaw.BC.periodic
    # aux (the velocity field) is periodic too — extrapolated aux ghosts
    # would break the telescoping at the domain seam
    solver.aux_bc_lower = [pyclaw.BC.periodic]
    solver.aux_bc_upper = [pyclaw.BC.periodic]
    solver.dt_initial = 0.4 / nx      # fixed dt: conservation at roundoff
    solver.dt_variable = False
    domain = pyclaw.Domain([0.0], [1.0], [nx])
    state = pyclaw.State(domain, 1, num_aux=1)
    x = domain.grid.x.centers
    state.aux[0] = 1.0 + 0.4 * np.sin(2 * np.pi * x)   # u(x) > 0
    state.q[0] = np.exp(-width * (x - 0.4) ** 2)
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = tfinal
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    return np.asarray(claw.solution.q[0]), x


def test_sharpclaw_fwave_conserves_mass():
    q, x = _setup("sharpclaw", 128)
    q0 = np.exp(-80.0 * (x - 0.4) ** 2)
    assert np.all(np.isfinite(q))
    assert abs(q.sum() - q0.sum()) < 1e-12 * max(1.0, abs(q0.sum()))


def test_sharpclaw_fwave_matches_classic():
    q_sc, _ = _setup("sharpclaw", 256)
    q_cl, _ = _setup("classic", 256)
    # different schemes, same PDE: agree to truncation level (the pulse
    # steepens where u dips, so the order-2 classic trails WENO5 there)
    assert np.max(np.abs(q_sc - q_cl)) < 5e-2


def test_sharpclaw_fwave_high_order_convergence():
    """Constant-velocity aux: the fwave decomposition is exact advection,
    so the WENO5 order must survive the fwave threading.  (With
    cell-centered variable u the fwave flux carries an O(dx) coefficient
    offset — a formulation property, same as the reference's
    cell-centered aux convention — so smooth-vc order is not the right
    probe for threading.)"""
    errs = []
    for nx in (64, 128):
        solver = pyclaw.SharpClawSolver1D(riemann.vc_advection_fwave_1D)
        solver.time_integrator = "SSP104"
        solver.lim_type = 2
        solver.all_bcs = pyclaw.BC.periodic
        solver.aux_bc_lower = [pyclaw.BC.periodic]
        solver.aux_bc_upper = [pyclaw.BC.periodic]
        solver.dt_initial = 0.4 / nx
        solver.dt_variable = False
        domain = pyclaw.Domain([0.0], [1.0], [nx])
        state = pyclaw.State(domain, 1, num_aux=1)
        x = domain.grid.x.centers
        state.aux[0] = 1.0
        state.q[0] = np.sin(2 * np.pi * x) ** 4
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = 0.4
        claw.num_output_times = 1
        claw.output_format = None
        claw.run()
        exact = np.sin(2 * np.pi * ((x - 0.4) % 1.0)) ** 4
        errs.append(np.abs(np.asarray(claw.solution.q[0]) - exact).mean())
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.5, (errs, rate)
