"""Distributed custom BCs (petclaw ownership-flag analog): user callbacks
applied on boundary-owning shards only must reproduce the serial result
exactly — including with halo/compute overlap active."""

import numpy as np
import pytest

import jax.numpy as jnp

import pyclaw_tpu as pyclaw
from pyclaw_tpu import parallel, riemann


def _inflow_lower(state, dim, t, qbc, auxbc, g):
    vals = jnp.asarray([0.8, 0.4, 0.0], qbc.dtype)
    shape = (3,) + (1,) * (qbc.ndim - 1)
    if qbc.ndim == 3:       # 2D: band along the given axis
        if dim == 0:
            return qbc.at[:, :g, :].set(vals.reshape(shape))
        return qbc.at[:, :, :g].set(vals.reshape(shape))
    return qbc.at[:, :g].set(vals[:2].reshape(2, 1))


def _run_2d(solver, overlap=None, tfinal=0.05):
    if overlap is not None:
        solver.overlap_halo = overlap
    solver.bc_lower = [pyclaw.BC.custom, pyclaw.BC.extrap]
    solver.bc_upper = [pyclaw.BC.extrap, pyclaw.BC.extrap]
    solver.user_bc_lower = _inflow_lower
    solver.dt_initial = 5e-4
    solver.dt_variable = False
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [32, 32])
    state = pyclaw.State(domain, 3)
    state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
    x, y = domain.grid.c_centers
    state.q[0] = np.exp(-60.0 * ((x - 0.4) ** 2 + (y - 0.5) ** 2))
    state.q[1:] = 0.0
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = tfinal
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    return np.asarray(claw.solution.q)


@pytest.mark.parametrize("overlap", [True, False])
def test_custom_bc_decomposition_invariance_2d(overlap):
    q_ser = _run_2d(pyclaw.ClawSolver2D(riemann.acoustics_2D))
    q_par = _run_2d(parallel.ClawSolver2D(riemann.acoustics_2D),
                    overlap=overlap)
    np.testing.assert_allclose(q_par, q_ser, atol=1e-13)
    # inflow actually did something
    assert abs(q_ser[0, 0, 16]) > 1e-8
