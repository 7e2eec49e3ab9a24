"""1D ideal MHD Riemann solver.

Capability parity with reference ``riemann/src/rp1_mhd.f90`` (SURVEY.md
§2.8 long tail).  q = (rho, rho u, rho v, rho w, By, Bz, E) with Bx a
constant parameter (problem_data['bx']; div B = 0 is trivial in 1D).

    p_total = p_gas + B^2/2,     E = p/(gamma-1) + rho|v|^2/2 + B^2/2

Solver: HLL two-wave (Davis speed bounds from the fast magnetosonic
speed) expressed in the wave-propagation fluctuation form — robust
through the Brio-Wu compound-wave structure where Roe-type MHD
eigensystems need careful degeneracy handling.  Positivity hook provided
for the SharpClaw WENO path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _mhd_flux(q, bx, gamma):
    rho = q[0]
    u = q[1] / rho
    v = q[2] / rho
    w = q[3] / rho
    by, bz = q[4], q[5]
    E = q[6]
    b2 = bx * bx + by * by + bz * bz
    ke = 0.5 * rho * (u * u + v * v + w * w)
    p = (gamma - 1.0) * (E - ke - 0.5 * b2)
    pt = p + 0.5 * b2
    return jnp.stack([
        q[1],
        q[1] * u + pt - bx * bx,
        q[2] * u - bx * by,
        q[3] * u - bx * bz,
        by * u - bx * v,
        bz * u - bx * w,
        (E + pt) * u - bx * (u * bx + v * by + w * bz),
    ]), p


def _fast_speed(q, bx, gamma, p):
    rho = q[0]
    a2 = gamma * p / rho
    b2r = (bx * bx + q[4] * q[4] + q[5] * q[5]) / rho
    bx2r = bx * bx / rho
    s = a2 + b2r
    disc = jnp.sqrt(jnp.maximum(s * s - 4.0 * a2 * bx2r, 0.0))
    return jnp.sqrt(0.5 * (s + disc))


def _rp_mhd_hll(ixy, q_l, q_r, aux_l, aux_r, params):
    gamma = params["gamma"]
    bx = params["bx"]

    F_l, p_l = _mhd_flux(q_l, bx, gamma)
    F_r, p_r = _mhd_flux(q_r, bx, gamma)
    u_l = q_l[1] / q_l[0]
    u_r = q_r[1] / q_r[0]
    cf_l = _fast_speed(q_l, bx, gamma, p_l)
    cf_r = _fast_speed(q_r, bx, gamma, p_r)

    # Davis bounds
    s_l = jnp.minimum(u_l - cf_l, u_r - cf_r)
    s_r = jnp.maximum(u_l + cf_l, u_r + cf_r)

    q_m = (s_r * q_r - s_l * q_l - (F_r - F_l)) / (s_r - s_l)

    wave = jnp.stack([q_m - q_l, q_r - q_m], axis=1)   # (num_eqn, 2, n)
    s = jnp.stack([s_l, s_r])
    amdq = jnp.minimum(s_l, 0.0) * wave[:, 0] \
        + jnp.minimum(s_r, 0.0) * wave[:, 1]
    apdq = jnp.maximum(s_l, 0.0) * wave[:, 0] \
        + jnp.maximum(s_r, 0.0) * wave[:, 1]
    return wave, s, amdq, apdq


def _mhd_positivity(q, aux, params):
    gamma = params["gamma"]
    bx = params["bx"]
    rho = q[0]
    safe_rho = jnp.where(rho > 0.0, rho, 1.0)
    ke = 0.5 * (q[1] ** 2 + q[2] ** 2 + q[3] ** 2) / safe_rho
    b2 = bx * bx + q[4] ** 2 + q[5] ** 2
    p = (gamma - 1.0) * (q[6] - ke - 0.5 * b2)
    return (rho > 0.0) & (p > 0.0)


from . import RiemannSolver  # noqa: E402

mhd_1D = RiemannSolver("mhd_1D", 1, 7, 2, _rp_mhd_hll,
                       requires=("gamma", "bx"))
mhd_1D.positivity = _mhd_positivity


def _flux_mhd(ixy, q, aux, params):
    """Ideal-MHD physical flux (RiemannSolver.flux protocol; reuses the
    solver's own _mhd_flux so the SharpClaw total fluctuation
    f(qr)-f(ql) matches the HLL fluctuation sum to roundoff)."""
    f, _ = _mhd_flux(q, params["bx"], params["gamma"])
    return f


mhd_1D.flux = _flux_mhd
