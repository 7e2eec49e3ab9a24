"""Combinatorial knob sweep (VERDICT r4 item 8): the 3D kernel-path
knobs — {tiled/monolithic/asymmetric-tile} x {fused/phased} x
{batch_transverse on/off} x {serial / 8-virtual-device} — multiply into
dozens of path combinations that were previously covered only by
hand-picked pairs.  This sweeps the matrix by construction on ONE small
3D capacity+aux problem (euler_3D with a synthetic capacity row — the
hardest dataflow: aux slabs, per-cell dtdx, double transverse) and
asserts every combination equals the monolithic serial reference to
roundoff."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

import pyclaw_tpu
from pyclaw_tpu import riemann


def _problem(n=12):
    rng = np.random.default_rng(42)
    q = np.ones((5, n, n, n))
    q[0] = 1.0 + 0.1 * rng.random((n, n, n))
    q[1:4] = 0.1 * rng.random((3, n, n, n))
    q[4] = 2.5 + 0.2 * rng.random((n, n, n))
    aux = 1.0 + 0.5 * rng.random((1, n, n, n))
    return q, aux


def _solver_run(parallel, impl, tile, batch, n=12):
    mod = __import__("pyclaw_tpu.parallel", fromlist=["ClawSolver3D"]) \
        if parallel else pyclaw_tpu
    solver = mod.ClawSolver3D(riemann.euler_3D)
    solver.all_bcs = pyclaw_tpu.BC.periodic
    solver.step3_impl = impl
    solver.soa_tile_rows = tile
    solver.batch_transverse = batch
    domain = pyclaw_tpu.Domain([0.0] * 3, [1.0] * 3, [n] * 3)
    state = pyclaw_tpu.State(domain, 5, num_aux=1)
    state.index_capa = 0
    q, aux = _problem(n)
    state.q[...] = q
    state.aux[...] = aux
    state.problem_data["gamma"] = 1.4
    sol = pyclaw_tpu.Solution(state, domain)
    solver.dt_initial = 2e-3
    solver.dt_variable = False
    claw = mod.Controller() if parallel else pyclaw_tpu.Controller()
    claw.solution = sol
    claw.solver = solver
    claw.output_format = None
    claw.tfinal = 6e-3              # 3 fixed steps
    claw.num_output_times = 1
    claw.run()
    return np.asarray(claw.solution.q)


MATRIX = list(itertools.product(
    ["fused", "phased"],            # step3_impl
    [0, 4, (8, 4)],                 # soa_tile_rows: monolithic / sym / asym
    [False, True],                  # batch_transverse
))


@pytest.fixture(scope="module")
def reference():
    return _solver_run(False, "fused", 0, False)


@pytest.mark.parametrize("impl,tile,batch", MATRIX)
def test_knob_matrix_serial(impl, tile, batch, reference):
    if impl == "fused" and tile == 0 and batch is False:
        return                      # the reference itself
    q = _solver_run(False, impl, tile, batch)
    np.testing.assert_allclose(q, reference, atol=1e-13)


@pytest.mark.parametrize("impl,tile,batch", [
    ("fused", 4, False),
    ("phased", (8, 4), True),
])
def test_knob_matrix_8device(impl, tile, batch, reference):
    """Representative corners of the matrix on the 8-virtual-device
    mesh (decomposition invariance composed with the knob sweep; the
    full 12-combo sweep x shard_map compile would dominate suite time
    for no extra path coverage — every knob and the distributed overlay
    are each exercised both ways across these two corners plus the
    serial sweep)."""
    q = _solver_run(True, impl, tile, batch)
    np.testing.assert_allclose(q, reference, atol=1e-12)
