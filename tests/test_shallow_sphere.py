"""Shallow water on the rotating sphere (reference examples/shallow_sphere;
redesigned lat-lon channel formulation — riemann/shallow_sphere.py).

Oracle: Williamson test case 2 — the geostrophic zonal flow is an exact
steady solution; numerical drift must be small and shrink with
resolution.  The kappa-weighted theta f-wave must telescope (interior
mass conservation), and the metric/Coriolis source must hold the
discrete balance (the TC2 residual pinned a sign and the
cell-centered-kappa f-wave form during development)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _run(mx, my, tfinal=5.0, **kw):
    from shallow_sphere import setup
    claw = setup(mx=mx, my=my, outdir=None, **kw)
    claw.tfinal = tfinal
    claw.num_output_times = 1
    q0 = claw.solution.q.copy()
    kap = claw.solution.state.aux[1].copy()
    claw.run()
    return q0, np.asarray(claw.solution.q), kap


def test_tc2_steady_state():
    q0, q, kap = _run(64, 32)
    assert np.all(np.isfinite(q))
    drift = np.abs(q[0] - q0[0]).max() / q0[0].max()
    assert drift < 0.05, drift
    assert np.abs(q[2]).max() < 0.02          # v stays near zero
    # kappa-mass drift only through the held-equilibrium boundaries
    m0 = (kap * q0[0]).sum()
    assert abs((kap * q[0]).sum() - m0) / m0 < 0.05

    # convergence: finer grid, smaller drift
    _, qf, _ = _run(128, 64)
    q0f = _run(128, 64, tfinal=1e-9)[0]   # IC at fine resolution
    drift_f = np.abs(qf[0] - q0f[0]).max() / q0f[0].max()
    assert drift_f < 0.75 * drift, (drift, drift_f)


def test_sphere_gravity_waves():
    """Perturbed TC2: the height bump radiates inertia-gravity waves;
    solution stays finite and positive, and the perturbation disperses
    (max |h - equilibrium| decreases)."""
    q0, q, kap = _run(64, 32, tfinal=4.0, perturb=True)
    assert np.all(np.isfinite(q))
    assert q[0].min() > 0.0
    qeq, _, _ = _run(64, 32, tfinal=1e-9)    # unperturbed equilibrium IC
    dev0 = np.abs(q0[0] - qeq[0]).max()
    dev1 = np.abs(q[0] - qeq[0]).max()
    assert dev1 < 0.8 * dev0, (dev0, dev1)
