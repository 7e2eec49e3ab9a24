"""Well-balanced shallow water over bathymetry + tfluct hook
(reference sill example / tfluct machinery, SURVEY.md §2.3)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import riemann  # noqa: E402


def test_lake_at_rest_exact():
    """h + b = const, u = 0 must be preserved to machine precision — the
    defining property of the well-balanced f-wave decomposition."""
    from sill import setup
    claw = setup(nx=200, perturb=0.0, outdir=None)
    eta0 = claw.solution.q[0] + claw.solution.state.aux[0]
    claw.run()
    eta = claw.solution.q[0] + claw.solution.state.aux[0]
    assert np.max(np.abs(eta - eta0)) < 1e-13
    assert np.max(np.abs(claw.solution.q[1])) < 1e-13
    assert claw.solver.status["numsteps"] > 5


def test_sill_perturbation():
    """A tiny surface perturbation must propagate over the sill without
    exciting spurious waves larger than itself."""
    from sill import setup
    eps = 1e-3
    claw = setup(nx=500, perturb=eps, outdir=None)
    claw.run()
    eta = claw.solution.q[0] + claw.solution.state.aux[0] - 1.0
    assert np.max(np.abs(eta)) < 2.0 * eps
    assert np.max(np.abs(eta)) > 0.05 * eps  # the wave is still there


def test_tfluct_hook_advection():
    """User tfluct solver: for advection the exact in-cell total
    fluctuation is u (qr - ql); supplying it must reproduce the default
    (rp-based) path to roundoff."""
    def run(use_tfluct):
        solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)
        solver.all_bcs = pyclaw.BC.periodic
        if use_tfluct:
            solver.tfluct_solver = True

            def tfluct(ixy, ql, qr, aux_l, aux_r, params):
                return params["u"] * (qr - ql)

            solver.tfluct = tfluct
        domain = pyclaw.Domain([0.0], [1.0], [64])
        state = pyclaw.State(domain, 1)
        state.problem_data["u"] = 1.0
        x = domain.grid.x.centers
        state.q[0, :] = np.exp(-100.0 * (x - 0.5) ** 2)
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = 0.5
        claw.num_output_times = 1
        claw.output_format = None
        claw.run()
        return claw.solution.q.copy()

    np.testing.assert_allclose(run(True), run(False), atol=1e-13)
