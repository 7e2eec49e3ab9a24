"""sw_aug_2D-class solver (2D shallow water over bathymetry, f-wave,
reference rpn2_shallow_bathymetry_fwave / GeoClaw sw_aug):

  - exact lake-at-rest well-balance (h + b = const, u = v = 0 must stay
    machine-still over a bumpy bottom),
  - a localized perturbation over the bump stays finite/positive and
    radiates symmetrically.
"""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _setup(perturb):
    solver = pyclaw.ClawSolver2D(riemann.sw_aug_2D)
    solver.fwave = True
    solver.all_bcs = pyclaw.BC.extrap
    solver.limiters = [pyclaw.limiters.tvd.minmod]
    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [50, 50])
    state = pyclaw.State(domain, 3, num_aux=1)
    state.problem_data["grav"] = 9.8
    x, y = domain.grid.c_centers
    b = 0.4 * np.exp(-8.0 * (x ** 2 + y ** 2))          # submerged bump
    state.aux[0] = b
    eta = 1.0 + (0.1 * np.exp(-60.0 * ((x - 0.4) ** 2 + y ** 2))
                 if perturb else 0.0)
    state.q[0] = eta - b
    state.q[1] = 0.0
    state.q[2] = 0.0
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.num_output_times = 1
    claw.output_format = None
    return claw


def test_lake_at_rest_is_exactly_balanced():
    claw = _setup(perturb=False)
    claw.tfinal = 0.5
    eta0 = claw.solution.q[0] + claw.solution.state.aux[0]
    claw.run()
    state = claw.solution.state
    eta = np.asarray(claw.solution.q[0]) + np.asarray(state.aux[0])
    np.testing.assert_allclose(eta, eta0, atol=1e-13)
    assert np.max(np.abs(np.asarray(claw.solution.q[1:]))) < 1e-13


def test_perturbation_over_bump():
    claw = _setup(perturb=True)
    claw.tfinal = 0.1   # gravity speed ~3.13: wave stays inside [-1,1]
    mass0 = np.asarray(claw.solution.q[0]).sum()
    claw.run()
    q = np.asarray(claw.solution.q)
    assert np.all(np.isfinite(q))
    assert q[0].min() > 0.0
    # mass conserved (fwave telescoping; extrap BCs barely reached)
    assert abs(q[0].sum() - mass0) / mass0 < 1e-6
    # y-symmetry of the configuration is preserved
    np.testing.assert_allclose(q[0], q[0][:, ::-1], atol=1e-10)
