"""End-to-end 1D regressions vs analytic solutions (BASELINE cfg2;
reference examples/*/test_*.py strategy, SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


# ---------------------------------------------------------------------
# exact Sod solution (gamma=1.4, standard left/right states)
# ---------------------------------------------------------------------
def sod_exact_density(x, t, gamma=1.4):
    rho_l, p_l = 1.0, 1.0
    rho_r, p_r = 0.125, 0.1
    c_l = np.sqrt(gamma * p_l / rho_l)
    # star-state constants (standard values for the Sod problem)
    p_star = 0.30313017805064707
    u_star = 0.9274526200489498
    rho_star_l = rho_l * (p_star / p_l) ** (1 / gamma)
    rho_star_r = rho_r * ((p_star / p_r + (gamma - 1) / (gamma + 1))
                          / ((gamma - 1) / (gamma + 1) * p_star / p_r + 1))
    c_star_l = np.sqrt(gamma * p_star / rho_star_l)
    s_shock = u_star * rho_star_r / (rho_star_r - rho_r) \
        if rho_star_r != rho_r else 0.0

    xi = x / t
    rho = np.empty_like(x)
    head = -c_l
    tail = u_star - c_star_l
    # rarefaction fan
    u_fan = 2.0 / (gamma + 1.0) * (c_l + xi)
    c_fan = c_l - 0.5 * (gamma - 1.0) * u_fan
    rho_fan = rho_l * (c_fan / c_l) ** (2.0 / (gamma - 1.0))

    rho = np.where(xi < head, rho_l,
                   np.where(xi < tail, rho_fan,
                            np.where(xi < u_star, rho_star_l,
                                     np.where(xi < s_shock, rho_star_r,
                                              rho_r))))
    return rho


@pytest.mark.parametrize("solver_type", ["classic", "sharpclaw"])
def test_sod_shock_tube(solver_type):
    from euler_1d_shocktube import setup
    claw = setup(nx=400, solver_type=solver_type, outdir=None)
    claw.run()
    x = claw.solution.domain.grid.x.centers
    rho = claw.solution.q[0]
    exact = sod_exact_density(x, claw.solution.t)
    l1 = np.mean(np.abs(rho - exact))
    assert l1 < 0.01, f"L1 density error {l1}"
    # positivity
    assert rho.min() > 0.0


def test_sod_conservation():
    from euler_1d_shocktube import setup
    claw = setup(nx=200, solver_type="classic", outdir=None)
    tot0 = claw.solution.q.sum(axis=1).copy()
    claw.run()
    # with extrap BCs nothing reaches the boundary by t=0.2 for this IC
    tot1 = claw.solution.q.sum(axis=1)
    np.testing.assert_allclose(tot1[0], tot0[0], rtol=1e-10)
    np.testing.assert_allclose(tot1[2], tot0[2], rtol=1e-10)


@pytest.mark.parametrize("solver_type", ["classic", "sharpclaw"])
def test_acoustics_1d(solver_type):
    """Wall reflection + outflow: by t=1 the left-going half pulse has
    reflected (x0=0.75 -> wall at 0 is 0.75 away, c=1: reflected wave is
    at x=0.25 moving right); compare against the d'Alembert solution."""
    from acoustics_1d import setup
    claw = setup(nx=400, solver_type=solver_type, outdir=None)
    claw.run()
    x = claw.solution.domain.grid.x.centers
    p = claw.solution.q[0]
    beta, x0 = 100.0, 0.75
    t = claw.solution.t  # = 1.0, c = 1, Z = 1

    # d'Alembert: p = 0.5 f(x - t) + 0.5 f(x + t), wall at x=0 reflects
    # with p -> p (pressure even about wall)
    def f(xx):
        return np.exp(-beta * (xx - x0) ** 2)

    # even extension about the wall: p = 0.5[f(x-t)+f(x+t)+f(t-x)+f(-x-t)];
    # at t=1 only the reflected pulse f(1-x) is inside the domain (the
    # right-going half exited through the extrap boundary).
    exact = 0.5 * (f(x - t) + f(x + t) + f(t - x) + f(-x - t))
    l1 = np.mean(np.abs(p - exact))
    assert l1 < 5e-3, f"L1 pressure error {l1}"


def test_burgers_shock_conservation_and_speed():
    from burgers_1d import setup
    claw = setup(nx=500, outdir=None)
    mass0 = claw.solution.q[0].mean()
    claw.run()
    mass1 = claw.solution.q[0].mean()
    # periodic: exact conservation
    np.testing.assert_allclose(mass1, mass0, atol=1e-12)
    # TVD: no new extrema beyond initial range
    assert claw.solution.q[0].max() <= 1.5 + 1e-8
    assert claw.solution.q[0].min() >= -0.5 - 1e-8


def test_shallow_dam_break():
    """Stoker solution check: depth between the states, positive, and the
    middle-state depth matches the exact value h_m ~ 1.84857 (h_l=3,
    h_r=1, g=1)."""
    from shallow_1d import setup
    claw = setup(nx=500, outdir=None)
    claw.run()
    x = claw.solution.domain.grid.x.centers
    h = claw.solution.q[0]
    assert h.min() > 0.99
    assert h.max() < 3.01
    # plateau near x=0.5*t* (between rarefaction and shock)
    mid = h[(x > 0.2) & (x < 1.0)]
    h_m_exact = 1.8485716
    assert abs(np.median(mid) - h_m_exact) < 0.01
