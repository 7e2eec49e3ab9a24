"""End-to-end regression: 1D advection (BASELINE cfg1; reference
examples/advection_1d/test_advection.py — verify vs exact solution)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from pyclaw_tpu.util import check_diff  # noqa: E402


def _exact(claw):
    x = claw.solution.domain.grid.x.centers
    beta, x0 = 100.0, 0.75
    t = claw.solution.t
    u = 1.0
    xm = (x - x0 - u * t) % 1.0
    xm = np.minimum(xm, 1.0 - xm)  # periodic distance
    return np.exp(-beta * xm ** 2)


@pytest.mark.parametrize("solver_type", ["classic", "sharpclaw"])
def test_advection_1d(solver_type):
    from advection_1d import setup
    claw = setup(nx=100, solver_type=solver_type, outdir=None)
    claw.run()
    q_final = claw.solution.q[0]
    expected = _exact(claw)
    # second-order + limiter on nx=100: a few percent peak clipping
    assert check_diff(expected, q_final, reltol=5e-2) is None
    assert claw.solver.status["numsteps"] > 0


def test_advection_convergence_classic():
    """Convergence under refinement: error should drop superlinearly."""
    from advection_1d import setup
    errs = []
    for nx in (100, 200):
        claw = setup(nx=nx, solver_type="classic", outdir=None)
        claw.run()
        err = np.max(np.abs(claw.solution.q[0] - _exact(claw)))
        errs.append(err)
    assert errs[1] < errs[0] / 1.8, errs


def test_conservation_classic():
    from advection_1d import setup
    claw = setup(nx=128, solver_type="classic", outdir=None)
    mass0 = np.sum(claw.solution.q[0])
    claw.run()
    mass1 = np.sum(claw.solution.q[0])
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0) + 1e-12
