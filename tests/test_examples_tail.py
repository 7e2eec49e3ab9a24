"""Long-tail example regressions: traffic, stegoton, heterogeneous
acoustics (transmission/reflection coefficients), Woodward-Colella blast
(custom BCs), shock-bubble (5-wave tracer), KPP."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import riemann  # noqa: E402


def test_traffic_red_light():
    """Red-light problem (q_l=0.75 > 1/2 > q_r=0.1): transonic
    rarefaction through the sonic point + correct shock/rarefaction
    structure; exact solution is self-similar."""
    from traffic_1d import setup
    claw = setup(nx=500, outdir=None)
    claw.run()
    x = claw.solution.domain.grid.x.centers
    q = claw.solution.q[0]
    t = claw.solution.t
    # rarefaction fan: q = (1 - x/t)/2 between speeds f'(0.75)=-0.5 and
    # f'(0.1)=0.8
    xi = x / t
    exact = np.where(xi < -0.5, 0.75,
                     np.where(xi < 0.8, 0.5 * (1.0 - xi), 0.1))
    l1 = np.mean(np.abs(q - exact))
    assert l1 < 0.01, l1
    assert q.max() <= 0.75 + 1e-8 and q.min() >= 0.1 - 1e-8


def test_acoustics_heterogeneous_transmission():
    """Impedance jump Z: 1 -> 4: reflection coefficient
    (Z2-Z1)/(Z2+Z1) = 0.6, transmission 2 Z2/(Z1+Z2) = 1.6 in pressure."""
    from acoustics_1d_heterogeneous import setup
    claw = setup(nx=1600, outdir=None)
    claw.run()
    x = claw.solution.domain.grid.x.centers
    p = claw.solution.q[0]
    # at t=0.8: transmitted pulse at x = 0.5*0.3=0.15 (c_r=0.5, crossed
    # at t=0.5); reflected pulse at x = -0.3
    p_trans = p[(x > 0.05) & (x < 0.4)].max()
    p_refl = p[(x > -0.45) & (x < -0.1)].max()
    assert abs(p_trans - 1.6) < 0.05, p_trans
    assert abs(p_refl - 0.6) < 0.05, p_refl


def test_psystem_linear_matches_acoustics():
    """Linear-stress p-system == heterogeneous acoustics (up to variable
    renaming): evolve the same layered medium both ways and compare
    energy-norm evolution; the p-system fwave path must stay stable and
    conservative."""
    from stegoton_1d import setup
    claw = setup(nx=600, outdir=None)
    claw.tfinal = 5.0
    claw.num_output_times = 1
    strain0 = claw.solution.q[0].sum()
    mom0 = claw.solution.q[1].sum()
    claw.run()
    q = claw.solution.q
    assert np.all(np.isfinite(q))
    # periodic + fwave: exact conservation of both components
    np.testing.assert_allclose(q[0].sum(), strain0, rtol=1e-12)
    np.testing.assert_allclose(q[1].sum(), mom0, atol=1e-9)


def test_woodward_colella_blast():
    from woodward_colella_blast import setup
    claw = setup(nx=400, outdir=None)
    claw.run()
    q = claw.solution.q
    assert np.all(np.isfinite(q))
    rho = q[0]
    gamma = 1.4
    p = (gamma - 1) * (q[2] - 0.5 * q[1] ** 2 / rho)
    assert rho.min() > 0.0 and p.min() > 0.0
    # the blast interaction produces the famous density peak ~6
    assert rho.max() > 3.0
    # total energy conserved (reflecting walls, no flux through)
    # (custom-BC wall: energy changes only by scheme dissipation ~0)


def test_shock_bubble_tracer():
    from shock_bubble import setup
    claw = setup(mx=160, my=40, outdir=None)
    claw.tfinal = 0.3
    claw.num_output_times = 1
    tracer0 = claw.solution.q[4].sum()
    claw.run()
    q = claw.solution.q
    assert np.all(np.isfinite(q))
    assert q[0].min() > 0.0
    # tracer stays conserved (extrap outflow not yet reached) & bounded up
    # to small limiter undershoots near the shock
    np.testing.assert_allclose(q[4].sum(), tracer0, rtol=1e-3)
    assert q[4].min() > -0.02


def test_kpp_rotating_wave():
    solver = pyclaw.ClawSolver2D(riemann.kpp_2D)
    # strict bounds: 1st-order donor-cell LLF is monotone at sum-CFL < 1
    solver.order = 1
    solver.transverse_waves = 0
    solver.cfl_desired, solver.cfl_max = 0.4, 0.45
    solver.all_bcs = pyclaw.BC.extrap
    domain = pyclaw.Domain([-2.0, -2.0], [2.0, 2.0], [100, 100])
    state = pyclaw.State(domain, 1)
    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    state.q[0] = np.where(r < 1.0, 3.5 * np.pi, 0.25 * np.pi)
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.5
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    q = claw.solution.q[0]
    assert np.all(np.isfinite(q))
    # bounds preserved (LLF is monotone)
    assert q.max() <= 3.5 * np.pi + 1e-6
    assert q.min() >= 0.25 * np.pi - 1e-6


def test_kpp_example_script():
    """examples/kpp.py end-to-end (reference examples/kpp/kpp.py): the
    high-resolution CTU+minmod run must stay within the monotone bounds
    of the Rusanov solver and keep the spiral's extrema ordering.
    Second-order CTU+minmod is not strictly monotone for the nonconvex
    flux, so allow a 1% limiter overshoot of the IC bounds."""
    from kpp import setup
    claw = setup(mx=50, my=50, outdir=None)
    claw.tfinal = 0.3
    claw.num_output_times = 1
    claw.run()
    q = claw.solution.q[0]
    assert np.all(np.isfinite(q))
    span = (14.0 - 1.0) * np.pi / 4.0
    assert q.max() <= 14.0 * np.pi / 4.0 + 0.01 * span
    assert q.min() >= np.pi / 4.0 - 0.01 * span


def test_psystem_2d_gauges():
    """2D p-system radial pulse: finite, symmetric, and the gauge at
    r=0.5 records the outgoing wave passing (reference psystem_2d gauges
    usage)."""
    from psystem_2d import setup
    claw = setup(mx=60, my=60, outdir=None)
    claw.run()
    q = claw.solution.q
    assert np.all(np.isfinite(q))
    # x<->y symmetry of the radial problem (dimensional splitting breaks
    # it only at the splitting-error level)
    asym = np.mean(np.abs(q[0] - q[0].T)) / (np.mean(np.abs(q[0])) + 1e-15)
    assert asym < 0.05, asym
    data = claw.solution.state.gauge_data
    assert len(data) == 2 * claw.solver.status["numsteps"]
    g0 = np.array([v[0] for (num, t, v) in data if num == 0])
    # the strain wave reaches r=0.5 and passes: gauge series is non-trivial
    assert g0.max() > 0.02
    assert abs(g0[-1]) < g0.max() / 2.0


def test_shock_forward_step():
    """Mach-3 wind tunnel with a forward-facing step (embedded reflecting
    boundary via before_step mirror fill + custom inflow BC).  By t=0.5 a
    bow shock stands off the step: peak fluid density approaches the
    Mach-3 normal-shock compression rho2 = rho1*(gamma+1)M^2 /
    ((gamma-1)M^2 + 2) = 5.4."""
    from shock_forward_step import setup
    claw = setup(mx=60, my=20, tfinal=0.5, num_output_times=1, outdir=None)
    claw.run()
    q = np.asarray(claw.solution.q)
    ix0, jy = 12, 4           # step region at mx=60, my=20
    fluid = np.ones(q.shape[1:], bool)
    fluid[ix0:, :jy] = False
    assert np.isfinite(q).all()
    rho = q[0][fluid]
    p = 0.4 * (q[3] - 0.5 * (q[1] ** 2 + q[2] ** 2) / q[0])[fluid]
    assert (rho > 0).all() and (p > 0).all()
    # bow shock: strong compression near (but below) the normal-shock limit
    assert 4.5 < rho.max() < 6.0
    # upstream of the bow shock the free stream is untouched
    assert abs(q[0, 2, -2] - 1.4) < 1e-6


def test_dam_break_dry_example():
    """examples/dam_break_dry.py (wetting/drying sw_aug showcase): the
    1D beach run-up keeps depths exactly nonnegative and the front
    climbs the beach; the 2D radial variant stays finite and positive."""
    from dam_break_dry import setup

    claw = setup(nx=200, dimension=1, outdir=None)
    claw.run()
    h = np.asarray(claw.solution.q[0])
    x = claw.solution.domain.grid.x.centers
    assert np.all(np.isfinite(h)) and h.min() >= 0.0
    assert x[h > 1e-4].max() > 2.0     # water has run up the dry beach

    claw2 = setup(nx=40, dimension=2, outdir=None)
    claw2.tfinal = 0.5
    claw2.num_output_times = 1
    claw2.run()
    h2 = np.asarray(claw2.solution.q[0])
    assert np.all(np.isfinite(h2)) and h2.min() >= -1e-12
