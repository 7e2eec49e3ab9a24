"""Mapped grids (mapc2p), 2D capacity, divergence-free vc advection
(reference advection_2d_annulus / advection_2d examples)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_annulus_full_rotation():
    """After one full rotation the pulse must return to its IC (the
    capacity kappa=r makes every ring rotate at the same angular speed);
    kappa-weighted mass is conserved exactly (fwave telescoping)."""
    from advection_2d_annulus import setup
    claw = setup(mr=32, mth=96, outdir=None)
    q0 = claw.solution.q[0].copy()
    kappa = claw.solution.state.aux[2]
    kmass0 = (kappa * q0).sum()
    claw.run()
    q1 = claw.solution.q[0]
    np.testing.assert_allclose((kappa * q1).sum(), kmass0, rtol=1e-12)
    err = np.max(np.abs(q1 - q0)) / q0.max()
    assert err < 0.35, err  # 2nd-order limited transport, one revolution
    # the pulse peak must be back near its initial angular position
    i0 = np.unravel_index(np.argmax(q0), q0.shape)
    i1 = np.unravel_index(np.argmax(q1), q1.shape)
    mth = q0.shape[1]
    dtheta_cells = min(abs(i1[1] - i0[1]), mth - abs(i1[1] - i0[1]))
    assert dtheta_cells <= 2, (i0, i1)


def test_annulus_mapc2p_geometry():
    from advection_2d_annulus import setup
    claw = setup(mr=8, mth=16, outdir=None)
    grid = claw.solution.domain.grid
    px, py = grid.p_centers
    r, th = grid.c_centers
    np.testing.assert_allclose(px, r * np.cos(th), atol=1e-14)
    np.testing.assert_allclose(np.sqrt(px ** 2 + py ** 2), r, atol=1e-14)


def test_swirl_conservation_and_bounds():
    from advection_2d import setup
    claw = setup(mx=64, my=64, outdir=None)
    mass0 = claw.solution.q[0].sum()
    claw.run()
    q = claw.solution.q[0]
    # stream-function edge velocities are discretely divergence-free:
    # mass conserved to roundoff (flow is zero on the boundary)
    np.testing.assert_allclose(q.sum(), mass0, rtol=1e-10)
    # color-equation max principle (up to small limiter overshoot)
    assert q.max() < 1.05 and q.min() > -0.05
