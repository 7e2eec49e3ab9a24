"""End-to-end 2D regressions (BASELINE cfg3/cfg4).

Oracles (SURVEY.md §4): radial symmetry preservation, conservation, x/y
transposition symmetry, cross-solver agreement (classic CTU vs
dimensional-split vs SharpClaw WENO — the dual-path consistency oracle),
and agreement with an equivalent 1D computation where applicable.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import riemann  # noqa: E402


@pytest.mark.parametrize("solver_type", ["classic", "sharpclaw"])
def test_acoustics_2d_symmetry(solver_type):
    from acoustics_2d import setup
    claw = setup(mx=80, my=80, solver_type=solver_type, outdir=None)
    claw.run()
    p = claw.solution.q[0]
    # radial IC on a square grid: solution must stay symmetric under
    # x<->y transposition and under flips
    np.testing.assert_allclose(p, p.T, atol=1e-10)
    np.testing.assert_allclose(p, p[::-1, :], atol=1e-10)
    np.testing.assert_allclose(p, p[:, ::-1], atol=1e-10)
    assert np.all(np.isfinite(p))
    assert claw.solver.status["numsteps"] > 3


def test_acoustics_2d_split_vs_unsplit():
    """Dimensional-split and unsplit CTU must agree to O(dt) per step —
    over a short run they should be close."""
    from acoustics_2d import setup
    sols = []
    for split in (False, True):
        claw = setup(mx=60, my=60, dimensional_split=split, outdir=None)
        claw.tfinal = 0.06
        claw.num_output_times = 1
        claw.run()
        sols.append(claw.solution.q[0].copy())
    err = np.max(np.abs(sols[0] - sols[1])) / np.max(np.abs(sols[0]))
    assert err < 0.05, f"split vs unsplit relative diff {err}"


def test_shallow_2d_radial():
    from shallow_2d_radial import setup
    claw = setup(mx=80, my=80, outdir=None)
    h0_total = claw.solution.q[0].sum()
    claw.run()
    h = claw.solution.q[0]
    np.testing.assert_allclose(h, h.T, atol=1e-10)
    assert h.min() > 0.0
    # mass conserved until the wave reaches the boundary (t=1, r~1.6<2.5)
    np.testing.assert_allclose(h.sum(), h0_total, rtol=1e-10)


def test_euler_2d_quadrants_classic():
    from euler_2d_quadrants import setup
    claw = setup(mx=100, my=100, solver_type="classic", outdir=None)
    claw.tfinal = 0.2
    claw.num_output_times = 1
    claw.run()
    q = claw.solution.q
    assert np.all(np.isfinite(q))
    rho = q[0]
    assert rho.min() > 0.0
    # config-4 symmetry: data symmetric under (x,y) swap
    np.testing.assert_allclose(rho, rho.T, atol=1e-8)
    gamma = 1.4
    p = (gamma - 1) * (q[3] - 0.5 * (q[1] ** 2 + q[2] ** 2) / rho)
    assert p.min() > 0.0


def test_euler_2d_classic_vs_sharpclaw():
    """Dual-path oracle: two entirely different discretizations of the
    same PDE must converge to the same solution."""
    from euler_2d_quadrants import setup
    fields = []
    for st in ("classic", "sharpclaw"):
        claw = setup(mx=100, my=100, solver_type=st, outdir=None)
        claw.tfinal = 0.1
        claw.num_output_times = 1
        claw.run()
        fields.append(claw.solution.q[0].copy())
    # L1 comparison: pointwise max-norm is dominated by 1-2 cell shock-
    # position differences between unrelated schemes
    err = np.mean(np.abs(fields[0] - fields[1])) / np.mean(np.abs(fields[0]))
    assert err < 0.01, f"classic vs sharpclaw L1 relative diff {err}"


def test_acoustics_2d_vs_1d_plane_wave():
    """A y-invariant plane wave in 2D must evolve exactly like the 1D
    solver (transverse terms see zero jumps)."""
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann

    nx = 64

    def ic(x):
        return np.exp(-80.0 * (x - 0.5) ** 2)

    # 1D run
    s1 = pyclaw.ClawSolver1D(riemann.acoustics_1D)
    s1.all_bcs = pyclaw.BC.periodic
    s1.limiters = [pyclaw.limiters.tvd.MC]
    d1 = pyclaw.Domain([0.0], [1.0], [nx])
    st1 = pyclaw.State(d1, 2)
    st1.problem_data.update(rho=1.0, bulk=1.0, zz=1.0, cc=1.0)
    st1.q[0, :] = ic(d1.grid.x.centers)
    st1.q[1, :] = 0.0
    c1 = pyclaw.Controller()
    c1.solution = pyclaw.Solution(st1, d1)
    c1.solver = s1
    c1.tfinal = 0.2
    c1.num_output_times = 1
    c1.output_format = None
    c1.run()

    # 2D run, y-invariant
    s2 = pyclaw.ClawSolver2D(riemann.acoustics_2D)
    s2.all_bcs = pyclaw.BC.periodic
    s2.limiters = [pyclaw.limiters.tvd.MC]
    d2 = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [nx, 8])
    st2 = pyclaw.State(d2, 3)
    st2.problem_data.update(rho=1.0, bulk=1.0, zz=1.0, cc=1.0)
    x2, _ = d2.grid.c_centers
    st2.q[0] = ic(x2)
    st2.q[1] = 0.0
    st2.q[2] = 0.0
    c2 = pyclaw.Controller()
    c2.solution = pyclaw.Solution(st2, d2)
    c2.solver = s2
    c2.tfinal = 0.2
    c2.num_output_times = 1
    c2.output_format = None
    # force the same dt sequence
    s1_dts = (c1.solver.status["dtmin"], c1.solver.status["dtmax"])
    c2.run()

    q2_slice = c2.solution.q[0][:, 4]
    # y-invariance preserved exactly
    assert np.max(np.abs(c2.solution.q[0] - c2.solution.q[0][:, :1])) < 1e-12
    # and matches the 1D evolution closely (dt sequences may differ)
    err = np.max(np.abs(q2_slice - c1.solution.q[0]))
    assert err < 5e-3, f"plane-wave 2D vs 1D diff {err} (dts {s1_dts})"


def test_burgers_2d_matches_1d_and_diagonal_symmetry():
    """2D Burgers oracles: y-invariant data evolves exactly like the 1D
    solver, and an x<->y symmetric IC stays symmetric through the full
    unsplit CTU sweep (rpt2_burgers equivalent)."""
    nx = 64
    x0 = np.linspace(0.0, 1.0, nx, endpoint=False) + 0.5 / nx
    ic = 0.5 + np.sin(2 * np.pi * x0) ** 2

    # 1D reference
    s1 = pyclaw.ClawSolver1D(riemann.burgers_1D)
    s1.limiters = [pyclaw.limiters.tvd.MC]
    s1.all_bcs = pyclaw.BC.periodic
    d1 = pyclaw.Domain([0.0], [1.0], [nx])
    st1 = pyclaw.State(d1, 1)
    st1.q[0] = ic
    c1 = pyclaw.Controller()
    c1.solution = pyclaw.Solution(st1, d1)
    c1.solver = s1
    c1.tfinal = 0.3
    c1.num_output_times = 1
    c1.output_format = None
    c1.run()

    # 2D with y-invariant IC
    s2 = pyclaw.ClawSolver2D(riemann.burgers_2D)
    s2.dimensional_split = False
    s2.limiters = [pyclaw.limiters.tvd.MC]
    s2.all_bcs = pyclaw.BC.periodic
    d2 = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [nx, 8])
    st2 = pyclaw.State(d2, 1)
    st2.q[0] = ic[:, None]
    c2 = pyclaw.Controller()
    c2.solution = pyclaw.Solution(st2, d2)
    c2.solver = s2
    c2.tfinal = 0.3
    c2.num_output_times = 1
    c2.output_format = None
    c2.run()
    q2 = np.asarray(c2.solution.q[0])
    # exact y-invariance
    assert np.max(np.abs(q2 - q2[:, :1])) < 1e-12
    # matches 1D (same dt sequence: same CFL policy on identical speeds)
    np.testing.assert_allclose(q2[:, 0], np.asarray(c1.solution.q[0]),
                               atol=1e-11)

    # diagonal symmetry
    s3 = pyclaw.ClawSolver2D(riemann.burgers_2D)
    s3.dimensional_split = False
    s3.limiters = [pyclaw.limiters.tvd.MC]
    s3.all_bcs = pyclaw.BC.periodic
    d3 = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [48, 48])
    st3 = pyclaw.State(d3, 1)
    X, Y = d3.grid.c_centers
    st3.q[0] = np.exp(-30.0 * ((X - 0.5) ** 2 + (Y - 0.5) ** 2))
    c3 = pyclaw.Controller()
    c3.solution = pyclaw.Solution(st3, d3)
    c3.solver = s3
    c3.tfinal = 0.4
    c3.num_output_times = 1
    c3.output_format = None
    c3.run()
    q3 = np.asarray(c3.solution.q[0])
    assert np.all(np.isfinite(q3))
    np.testing.assert_allclose(q3, q3.T, atol=1e-11)
