"""Per-system flux functions for the SharpClaw total fluctuation.

The reference's flux1.f90 tfluct-free default computes the in-cell total
fluctuation as the flux difference f(qr_i) - f(ql_i) — two cheap flux
evaluations.  Conservative Riemann solvers satisfy
amdq + apdq = f(qr) - f(ql) exactly (the Roe property / HLLE
conservation), so the registered ``RiemannSolver.flux`` path must agree
with the second-Riemann-solve fallback to roundoff.  These tests pin
that equality for every solver carrying a flux, on the AoS kernel and
the SoA fast path, plus an end-to-end equality on the cfg4 problem.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyclaw_tpu import riemann
from pyclaw_tpu.sharpclaw import kernels, soa


def _smooth(num_eqn, n, rng, base, amp=0.1):
    x = np.linspace(0.0, 1.0, n)
    q = np.empty((num_eqn, n))
    for e in range(num_eqn):
        ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
        q[e] = base[e] + amp * (np.sin(2 * np.pi * x + ph1)
                                + 0.5 * np.cos(4 * np.pi * x + ph2))
    return jnp.asarray(q)


CASES = [
    # (solver, params, base state per equation)
    (riemann.advection_1D, {"u": 1.3}, [1.0]),
    (riemann.burgers_1D, {}, [1.0]),
    (riemann.traffic_1D, {"umax": 1.0}, [0.4]),
    (riemann.acoustics_1D, {"rho": 1.0, "bulk": 4.0}, [1.0, 0.5]),
    (riemann.euler_with_efix_1D, {"gamma": 1.4}, [1.0, 0.3, 2.5]),
    (riemann.euler_roe_1D, {"gamma": 1.4}, [1.0, 0.3, 2.5]),
    (riemann.euler_hlle_1D, {"gamma": 1.4}, [1.0, 0.3, 2.5]),
    (riemann.shallow_roe_with_efix_1D, {"grav": 1.0}, [1.0, 0.2]),
    (riemann.shallow_hlle_1D, {"grav": 1.0}, [1.0, 0.2]),
    (riemann.mhd_1D, {"gamma": 5.0 / 3.0, "bx": 0.75},
     [1.0, 0.1, 0.05, 0.02, 1.0, 0.3, 2.5]),
]

CASES_2D = [
    (riemann.acoustics_2D, {"rho": 1.0, "bulk": 4.0}, [1.0, 0.5, 0.3]),
    (riemann.euler_4wave_2D, {"gamma": 1.4}, [1.0, 0.3, 0.2, 2.5]),
    (riemann.euler_5wave_2D, {"gamma": 1.4}, [1.0, 0.3, 0.2, 2.5, 0.7]),
    (riemann.shallow_roe_with_efix_2D, {"grav": 1.0}, [1.0, 0.2, 0.1]),
    (riemann.acoustics_3D, {"rho": 1.0, "bulk": 4.0}, [1.0, 0.5, 0.3, 0.2]),
    (riemann.euler_3D, {"gamma": 1.4}, [1.0, 0.3, 0.2, 0.1, 2.5]),
]


@pytest.mark.parametrize("rs,params,base",
                         CASES + CASES_2D,
                         ids=[c[0].name for c in CASES + CASES_2D])
def test_flux_matches_riemann_adq(rs, params, base):
    """dq_1d with the registered flux == dq_1d with the second Riemann
    solve, to roundoff (f64), on every sweep direction the solver has."""
    rng = np.random.default_rng(7)
    qbc = _smooth(rs.num_eqn, 64, rng, base)
    for ixy in range(rs.num_dim):
        dq_f, cfl_f = kernels.dq_1d(qbc, None, 0.001, 1.0 / 64, rs.rp,
                                    params, 2, 5, -1, 3, ixy=ixy,
                                    flux=rs.flux)
        dq_r, cfl_r = kernels.dq_1d(qbc, None, 0.001, 1.0 / 64, rs.rp,
                                    params, 2, 5, -1, 3, ixy=ixy,
                                    flux=None)
        np.testing.assert_allclose(np.asarray(dq_f), np.asarray(dq_r),
                                   rtol=0, atol=1e-12)
        assert float(cfl_f) == pytest.approx(float(cfl_r), abs=1e-14)


@pytest.mark.parametrize(
    "rs,params,base",
    [c for c in CASES_2D if c[0].flux_soa is not None],
    ids=[c[0].name for c in CASES_2D if c[0].flux_soa is not None])
def test_flux_soa_matches_riemann_adq(rs, params, base):
    rng = np.random.default_rng(11)
    q1 = _smooth(rs.num_eqn, 48, rng, base)
    q2 = _smooth(rs.num_eqn, 40, rng, base)
    qbc = q1[:, :, None] * (q2[:, None, :] / np.asarray(base)[:, None, None])
    dq_f, _ = soa.dq_2d_soa(qbc, 0.001, 1.0 / 48, 1.0 / 40, rs.rpn_soa,
                            params, 5, 3, flux_soa=rs.flux_soa)
    dq_r, _ = soa.dq_2d_soa(qbc, 0.001, 1.0 / 48, 1.0 / 40, rs.rpn_soa,
                            params, 5, 3, flux_soa=None)
    np.testing.assert_allclose(np.asarray(dq_f), np.asarray(dq_r),
                               rtol=0, atol=1e-12)


def test_all_flux_solvers_registered():
    """Every solver the VERDICT asked for carries a flux function."""
    for name in ("euler_with_efix_1D", "euler_roe_1D", "euler_hlle_1D",
                 "euler_4wave_2D", "euler_5wave_2D", "euler_3D",
                 "acoustics_1D", "acoustics_2D", "acoustics_3D",
                 "shallow_roe_with_efix_1D", "shallow_hlle_1D",
                 "shallow_roe_with_efix_2D", "advection_1D",
                 "advection_2D", "advection_3D", "burgers_1D",
                 "burgers_2D", "burgers_3D", "traffic_1D", "mhd_1D"):
        assert riemann.ALL[name].flux is not None, name
    # fwave-form solvers must NOT register one (their fluctuations carry
    # the source; f(qr)-f(ql) would drop it)
    for name in ("shallow_bathymetry_fwave_1D", "shallow_bathymetry_fwave_2D",
                 "vc_advection_fwave_1D", "vc_advection_fwave_2D"):
        assert riemann.ALL[name].flux is None, name


def test_end_to_end_quadrants_equality():
    """cfg4 (euler quadrants, WENO5+SSP104) stepped with and without the
    flux fast path: identical trajectories to roundoff."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "examples"))
    from euler_2d_quadrants import setup

    outs = {}
    for use_flux in (True, False):
        claw = setup(mx=48, my=48, solver_type="sharpclaw", outdir=None)
        if not use_flux:
            claw.solver.rp = _strip_flux(claw.solver.rp)
        claw.tfinal = 0.05
        claw.num_output_times = 1
        claw.run()
        outs[use_flux] = np.asarray(claw.solution.q)
    np.testing.assert_allclose(outs[True], outs[False], rtol=0, atol=1e-11)


def _strip_flux(rs):
    import copy
    rs2 = copy.copy(rs)
    rs2.flux = None
    rs2.flux_soa = None
    return rs2
