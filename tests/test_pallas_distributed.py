"""Distributed Pallas backend (round 5): the fused Mosaic kernels run
per-shard inside shard_map on the halo-exchanged local block, so the
decomposition-invariance contract (tests/test_parallel.py) must hold for
backend='pallas' exactly as for the XLA kernels.  On CPU the kernels run
in interpret mode (the sanitizer, SURVEY.md §5.2); tile-geometry
decisions key off the shard-LOCAL block (Solver._kernel_cells)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import jax  # noqa: E402

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import parallel, riemann  # noqa: E402


def _run_2d(solver, mx=64, my=512, tfinal=0.03):
    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    state.q[0] = np.where(np.abs(r - 0.5) <= 0.2,
                          1.0 + np.cos(np.pi * (r - 0.5) / 0.2), 0.0)
    state.q[1] = 0.0
    state.q[2] = 0.0
    solver.all_bcs = pyclaw.BC.extrap
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = tfinal
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    return claw.solution.q.copy()


def test_classic_2d_distributed_pallas_invariance():
    """64x512 on the default (2,4) mesh -> local (32,128): the row
    kernel engages per shard; result must equal the serial XLA run."""
    assert len(jax.devices()) == 8
    q_ser = _run_2d(pyclaw.ClawSolver2D(riemann.acoustics_2D))
    d = parallel.ClawSolver2D(riemann.acoustics_2D)
    d.backend = "pallas"
    q_dist = _run_2d(d)
    assert d.backend == "pallas"          # no silent fallback
    assert d.overlap_halo is False        # blocking halo form forced
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)


def test_sharpclaw_2d_distributed_pallas_invariance():
    q_ser = _run_2d(pyclaw.SharpClawSolver2D(riemann.acoustics_2D))
    d = parallel.SharpClawSolver2D(riemann.acoustics_2D)
    d.backend = "pallas"
    q_dist = _run_2d(d)
    assert d.backend == "pallas"
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)


def _run_3d(solver, n=(16, 32, 64), tfinal=0.02):
    domain = pyclaw.Domain([0.0] * 3, [1.0] * 3, list(n))
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data.update(gamma=1.4)
    x, y, z = domain.grid.c_centers
    r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
    state.q[0] = 1.0 + 0.5 * np.exp(-50 * r2)
    state.q[1] = state.q[2] = state.q[3] = 0.0
    state.q[4] = (1.0 + 0.2 * np.exp(-50 * r2)) / 0.4
    solver.all_bcs = pyclaw.BC.periodic
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = tfinal
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    return claw.solution.q.copy()


def test_classic_3d_distributed_pallas_invariance():
    """(16,32,64) on the (2,2,2) mesh -> local (8,16,32): the fused
    (x,y)-tiled 3D kernel engages per shard."""
    q_ser = _run_3d(pyclaw.ClawSolver3D(riemann.euler_3D))
    d = parallel.ClawSolver3D(riemann.euler_3D)
    d.backend = "pallas"
    q_dist = _run_3d(d)
    assert d.backend == "pallas"
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)


def test_distributed_pallas_ineligible_falls_back_to_xla():
    """A shard-local 3D block no (x,y) tile divides: setup must fall
    back to the XLA kernels (and restore the overlap setting) instead of
    raising — global (16,24,64) on (2,2,2) -> local (8,12,32)."""
    d = parallel.ClawSolver3D(riemann.euler_3D)
    d.backend = "pallas"
    q_dist = _run_3d(d, n=(16, 24, 64))
    assert d.backend == "xla"
    assert d.overlap_halo is True
    q_ser = _run_3d(pyclaw.ClawSolver3D(riemann.euler_3D), n=(16, 24, 64))
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)


def test_distributed_pallas_generic_aux_capacity():
    """The generic-AoS roll body (aux + capacity, vc advection) under
    shard_map: the hardest 2D dataflow — per-cell dtdx and aux slabs
    ride the halo exchange into the per-shard kernel."""
    def run(solver, mx=16, my=512, tfinal=0.05):
        domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [mx, my])
        state = pyclaw.State(domain, 1, num_aux=3)
        state.index_capa = 2
        x, y = domain.grid.c_centers
        state.q[0] = np.exp(-30.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        state.aux[0] = 1.0 + 0.3 * np.sin(2 * np.pi * y)
        state.aux[1] = 0.5 + 0.3 * np.cos(2 * np.pi * x)
        state.aux[2] = 1.0 + 0.2 * np.sin(2 * np.pi * x) \
            * np.cos(2 * np.pi * y)
        solver.all_bcs = pyclaw.BC.periodic
        solver.aux_bc_lower = [pyclaw.BC.periodic] * 2
        solver.aux_bc_upper = [pyclaw.BC.periodic] * 2
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = tfinal
        claw.num_output_times = 1
        claw.output_format = None
        claw.run()
        return claw.solution.q.copy()

    q_ser = run(pyclaw.ClawSolver2D(riemann.vc_advection_2D))
    d = parallel.ClawSolver2D(riemann.vc_advection_2D)
    d.backend = "pallas"
    q_dist = run(d)
    assert d.backend == "pallas"
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)


def test_classic_1d_distributed_pallas_invariance():
    """1D: the single-block roll kernel per shard (the newly enabled
    distributed 1D pallas path needs its own invariance pin)."""
    def run1d(solver, nx=256, tfinal=0.1):
        domain = pyclaw.Domain([0.0], [1.0], [nx])
        state = pyclaw.State(domain, solver.rp.num_eqn)
        state.problem_data.update(rho=1.0, bulk=1.0, zz=1.0, cc=1.0)
        x = domain.grid.x.centers
        state.q[0, :] = np.exp(-100.0 * (x - 0.5) ** 2)
        state.q[1:, :] = 0.0
        solver.all_bcs = pyclaw.BC.periodic
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = tfinal
        claw.num_output_times = 1
        claw.output_format = None
        claw.run()
        return claw.solution.q.copy()

    q_ser = run1d(pyclaw.ClawSolver1D(riemann.acoustics_1D))
    d = parallel.ClawSolver1D(riemann.acoustics_1D)
    d.backend = "pallas"
    q_dist = run1d(d)
    assert d.backend == "pallas"
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)


def test_distributed_pallas_2d_ineligible_falls_back_to_xla():
    """A shard-local 2D block whose lanes are not a 128-multiple must
    fall back to the XLA kernels at setup (the serial apron/single-block
    fallbacks would fail Mosaic's DMA alignment on-chip): global
    (64, 480) on the (2,4) mesh -> local (32, 120)."""
    q_ser = _run_2d(pyclaw.ClawSolver2D(riemann.acoustics_2D),
                    mx=64, my=480)
    d = parallel.ClawSolver2D(riemann.acoustics_2D)
    d.backend = "pallas"
    q_dist = _run_2d(d, mx=64, my=480)
    assert d.backend == "xla"
    assert d.overlap_halo is True
    np.testing.assert_allclose(q_dist, q_ser, atol=1e-13)
