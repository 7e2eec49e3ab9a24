"""Riemann-solver unit tests on random Riemann-problem batteries
(SURVEY.md §7 "hard parts": verify branch-free efix rewrites).

Key oracle: for any conservative solver, amdq + apdq == f(q_r) - f(q_l)
(flux-difference splitting consistency), checked against independent flux
functions implemented here.
"""

import numpy as np
import pytest

from pyclaw_tpu import riemann

RNG = np.random.default_rng(12345)
N = 200


def flux_euler_1d(q, gamma=1.4):
    rho, mom, E = q
    u = mom / rho
    p = (gamma - 1.0) * (E - 0.5 * mom * u)
    return np.stack([mom, mom * u + p, u * (E + p)])


def flux_shallow_1d(q, grav=1.0):
    h, hu = q
    u = hu / h
    return np.stack([hu, hu * u + 0.5 * grav * h * h])


def flux_burgers(q):
    return 0.5 * q * q


def flux_acoustics(q, rho=1.0, bulk=2.0):
    p, u = q
    return np.stack([bulk * u, p / rho])


def random_euler_states(n):
    rho = RNG.uniform(0.1, 2.0, n)
    u = RNG.uniform(-1.0, 1.0, n)
    p = RNG.uniform(0.1, 2.0, n)
    E = p / 0.4 + 0.5 * rho * u * u
    return np.stack([rho, rho * u, E])


@pytest.mark.parametrize("efix", [True, False])
def test_euler_1d_flux_consistency(efix):
    rs = riemann.euler_with_efix_1D if efix else riemann.euler_roe_1D
    q_l = random_euler_states(N)
    q_r = random_euler_states(N)
    params = {"gamma": 1.4}
    wave, s, amdq, apdq = rs.rp(0, q_l, q_r, None, None, params)
    df = flux_euler_1d(q_r) - flux_euler_1d(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)
    # waves sum to the jump (Roe property)
    np.testing.assert_allclose(np.asarray(wave).sum(axis=1), q_r - q_l,
                               atol=1e-10)


def test_euler_1d_hlle_consistency():
    q_l = random_euler_states(N)
    q_r = random_euler_states(N)
    wave, s, amdq, apdq = riemann.euler_hlle_1D.rp(0, q_l, q_r, None, None,
                                                   {"gamma": 1.4})
    df = flux_euler_1d(q_r) - flux_euler_1d(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)


def test_shallow_1d_flux_consistency():
    h = RNG.uniform(0.1, 3.0, N)
    hu = RNG.uniform(-1.0, 1.0, N) * h
    q_l = np.stack([h, hu])
    h2 = RNG.uniform(0.1, 3.0, N)
    hu2 = RNG.uniform(-1.0, 1.0, N) * h2
    q_r = np.stack([h2, hu2])
    wave, s, amdq, apdq = riemann.shallow_roe_with_efix_1D.rp(
        0, q_l, q_r, None, None, {"grav": 1.0})
    df = flux_shallow_1d(q_r) - flux_shallow_1d(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)


def test_burgers_consistency():
    q_l = RNG.uniform(-2.0, 2.0, (1, N))
    q_r = RNG.uniform(-2.0, 2.0, (1, N))
    wave, s, amdq, apdq = riemann.burgers_1D.rp(0, q_l, q_r, None, None,
                                                {"efix": True})
    df = flux_burgers(q_r) - flux_burgers(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)


def test_acoustics_1d_consistency():
    q_l = RNG.standard_normal((2, N))
    q_r = RNG.standard_normal((2, N))
    params = {"rho": 1.0, "bulk": 2.0}
    wave, s, amdq, apdq = riemann.acoustics_1D.rp(0, q_l, q_r, None, None,
                                                  params)
    df = flux_acoustics(q_r, 1.0, 2.0) - flux_acoustics(q_l, 1.0, 2.0)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-12)


def test_euler_2d_flux_consistency():
    def flux2d(q, gamma=1.4):
        rho, mu_, mv_, E = q
        u = mu_ / rho
        p = (gamma - 1.0) * (E - 0.5 * (mu_ ** 2 + mv_ ** 2) / rho)
        return np.stack([mu_, mu_ * u + p, mv_ * u, u * (E + p)])

    rho = RNG.uniform(0.1, 2.0, N)
    u = RNG.uniform(-1.0, 1.0, N)
    v = RNG.uniform(-1.0, 1.0, N)
    p = RNG.uniform(0.1, 2.0, N)
    E = p / 0.4 + 0.5 * rho * (u * u + v * v)
    q_l = np.stack([rho, rho * u, rho * v, E])
    rho2 = RNG.uniform(0.1, 2.0, N)
    u2 = RNG.uniform(-1.0, 1.0, N)
    v2 = RNG.uniform(-1.0, 1.0, N)
    p2 = RNG.uniform(0.1, 2.0, N)
    E2 = p2 / 0.4 + 0.5 * rho2 * (u2 * u2 + v2 * v2)
    q_r = np.stack([rho2, rho2 * u2, rho2 * v2, E2])

    wave, s, amdq, apdq = riemann.euler_4wave_2D.rp(0, q_l, q_r, None, None,
                                                    {"gamma": 1.4})
    df = flux2d(q_r) - flux2d(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)
    np.testing.assert_allclose(np.asarray(wave).sum(axis=1), q_r - q_l,
                               atol=1e-10)


def test_euler_3d_flux_consistency():
    def flux3d(q, gamma=1.4):
        rho, mx, my, mz, E = q
        u = mx / rho
        p = (gamma - 1.0) * (E - 0.5 * (mx ** 2 + my ** 2 + mz ** 2) / rho)
        return np.stack([mx, mx * u + p, my * u, mz * u, u * (E + p)])

    def rand(n):
        rho = RNG.uniform(0.1, 2.0, n)
        vel = RNG.uniform(-1.0, 1.0, (3, n))
        p = RNG.uniform(0.1, 2.0, n)
        E = p / 0.4 + 0.5 * rho * (vel ** 2).sum(axis=0)
        return np.stack([rho, rho * vel[0], rho * vel[1], rho * vel[2], E])

    q_l, q_r = rand(N), rand(N)
    wave, s, amdq, apdq = riemann.euler_3D.rp(0, q_l, q_r, None, None,
                                              {"gamma": 1.4})
    df = flux3d(q_r) - flux3d(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)


def test_shallow_2d_flux_consistency():
    def flux2d(q, grav=1.0):
        h, hu, hv = q
        u = hu / h
        return np.stack([hu, hu * u + 0.5 * grav * h * h, hv * u])

    def rand(n):
        h = RNG.uniform(0.1, 3.0, n)
        u = RNG.uniform(-0.5, 0.5, n)
        v = RNG.uniform(-0.5, 0.5, n)
        return np.stack([h, h * u, h * v])

    q_l, q_r = rand(N), rand(N)
    wave, s, amdq, apdq = riemann.shallow_roe_with_efix_2D.rp(
        0, q_l, q_r, None, None, {"grav": 1.0})
    df = flux2d(q_r) - flux2d(q_l)
    np.testing.assert_allclose(np.asarray(amdq + apdq), df, atol=1e-10)


def test_transverse_zero_input():
    """Transverse splitters: zero fluctuation in -> zero out."""
    q_l = random_euler_states(N)[[0, 1, 1, 2]]  # fake 2D states
    q_l[2] *= 0.3
    q_r = q_l[:, ::-1].copy()
    z = np.zeros_like(q_l)
    bm, bp = riemann.euler_4wave_2D.rpt(0, 1, q_l, q_r, None, None, z,
                                        {"gamma": 1.4})
    assert np.allclose(np.asarray(bm), 0) and np.allclose(np.asarray(bp), 0)


def test_transverse_completeness_acoustics():
    """bm + bp must equal the transverse Jacobian applied to asdq; for
    acoustics B = [[0,0,K],[0,0,0],[1/rho,0,0]] (y-direction)."""
    rho, bulk = 1.0, 2.0
    params = {"rho": rho, "bulk": bulk}
    asdq = RNG.standard_normal((3, N))
    bm, bp = riemann.acoustics_2D.rpt(0, 1, None, None, None, None, asdq,
                                      params)
    B_asdq = np.stack([bulk * asdq[2],
                       np.zeros(N),
                       asdq[0] / rho])
    np.testing.assert_allclose(np.asarray(bm + bp), B_asdq, atol=1e-12)
