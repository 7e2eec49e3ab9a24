"""Limiter library: TVD property (total variation non-increasing on 1D
advection) for every implemented id, including the CFL-dependent ones
(reference limiters/tvd.py table; SURVEY.md §2.4)."""

import numpy as np
import pytest

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _tv(q):
    return np.abs(np.diff(q, append=q[0])).sum()


@pytest.mark.parametrize("lid", [1, 2, 3, 4, 7, 8, 9, 10, 11, 12, 13, 14,
                                 15, 16, 17, 18, 19, 20, 21])
def test_limiter_tvd_property(lid):
    solver = pyclaw.ClawSolver1D(riemann.advection_1D)
    solver.limiters = [lid]
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0], [1.0], [128])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0
    x = domain.grid.x.centers
    # discontinuous + smooth mix stresses the limiter
    state.q[0, :] = np.where((x > 0.2) & (x < 0.4), 1.0, 0.0) \
        + 0.5 * np.exp(-200.0 * (x - 0.7) ** 2)
    tv0 = _tv(state.q[0])
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.5
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    tv1 = _tv(claw.solution.q[0])
    assert tv1 <= tv0 + 1e-10, (lid, tv0, tv1)
    assert np.all(np.isfinite(claw.solution.q))


@pytest.mark.parametrize("lid", [5, 6])
def test_nontvd_limiters_run(lid):
    """Beam-Warming and Fromm are accurate but not TVD: just require
    stability and boundedness on smooth data."""
    solver = pyclaw.ClawSolver1D(riemann.advection_1D)
    solver.limiters = [lid]
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0], [1.0], [128])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0
    x = domain.grid.x.centers
    state.q[0, :] = np.sin(2 * np.pi * x)
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 1.0
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    err = np.max(np.abs(claw.solution.q[0] - np.sin(2 * np.pi * x)))
    assert err < 0.05, err
