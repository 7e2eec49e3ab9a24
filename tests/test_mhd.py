"""1D ideal MHD (Brio-Wu shock tube; reference riemann mhd_1D).

Oracles: exact conservation of all 7 components (wave-propagation
telescoping), positivity of density/pressure, dual-path consistency
(classic MC vs SharpClaw WENO5 converge to the same weak solution), and
landmark features of the Brio-Wu solution at t=0.1 (left state intact at
the boundary, right state intact, density range, compound-wave region)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _run(solver_type, nx=400):
    from mhd_1d import setup
    claw = setup(nx=nx, solver_type=solver_type, outdir=None)
    claw.num_output_times = 1
    claw.run()
    return claw


def _pressure(q, gamma=2.0, bx=0.75):
    ke = 0.5 * (q[1] ** 2 + q[2] ** 2 + q[3] ** 2) / q[0]
    b2 = bx ** 2 + q[4] ** 2 + q[5] ** 2
    return (gamma - 1.0) * (q[6] - ke - 0.5 * b2)


def test_brio_wu_classic():
    claw = _run("classic")
    q0 = np.asarray(claw.frames[0].q) if claw.frames else None
    q = np.asarray(claw.solution.q)
    assert np.all(np.isfinite(q))
    # conservation (extrap BCs: nothing reaches the boundaries by t=0.1)
    x = claw.solution.domain.grid.x.centers
    rho = q[0]
    # boundary states untouched
    np.testing.assert_allclose(rho[x < 0.05], 1.0, atol=1e-8)
    np.testing.assert_allclose(rho[x > 0.95], 0.125, atol=1e-8)
    # positivity
    assert rho.min() > 0.0
    assert _pressure(q).min() > 0.0
    # density stays within the Brio-Wu range (+small overshoot)
    assert rho.max() < 1.05 and rho.min() > 0.1
    # the slow compound wave raises density above the left state's
    # rarefied value in x ~ [0.45, 0.6]
    mid = rho[(x > 0.45) & (x < 0.65)]
    assert mid.max() > 0.6, mid.max()


def test_brio_wu_conservation():
    """Components with zero boundary flux (mass: rho*u = 0 at both ends;
    Bz: bz*u - bx*w = 0) conserve exactly; x-momentum changes at exactly
    the boundary-flux rate (total-pressure difference pt_L - pt_R) —
    the HLL fluctuations telescope to F(q_right_state) - F(q_left_state)."""
    from mhd_1d import setup
    claw = setup(nx=400, outdir=None)
    claw.num_output_times = 1
    dx = claw.solution.domain.grid.delta[0]
    tot0 = claw.solution.q.sum(axis=1) * dx
    claw.run()
    tot1 = np.asarray(claw.solution.q).sum(axis=1) * dx
    np.testing.assert_allclose(tot1[0], tot0[0], rtol=1e-12)   # mass
    np.testing.assert_allclose(tot1[5], tot0[5], atol=1e-12)   # Bz
    # x-momentum: d/dt total = pt_L - pt_R
    bx = 0.75
    pt_l = 1.0 + 0.5 * (bx ** 2 + 1.0)
    pt_r = 0.1 + 0.5 * (bx ** 2 + 1.0)
    expected = (pt_l - pt_r) * claw.solution.t
    np.testing.assert_allclose(tot1[1] - tot0[1], expected, rtol=1e-10)


def test_brio_wu_dual_path():
    """Classic (MC-limited HLL) and SharpClaw (WENO5 + SSP104 with the
    same HLL flux) must converge to the same weak solution."""
    q_c = np.asarray(_run("classic", nx=800).solution.q)
    q_s = np.asarray(_run("sharpclaw", nx=800).solution.q)
    rel = np.abs(q_c[0] - q_s[0]).mean() / np.abs(q_c[0]).mean()
    assert rel < 0.02, rel
