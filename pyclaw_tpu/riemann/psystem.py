"""Nonlinear-elasticity p-system Riemann solver (f-wave, heterogeneous
media) — the stegoton problem.

Physics parity with reference ``riemann/src/rp1_psystem.f90`` (examples/
stegoton_1d; SURVEY.md §2.8): q = (eps, rho*u) with
    eps_t - u_x = 0
    (rho u)_t - sigma(eps, x)_x = 0
aux = (rho(x), K(x)); stress sigma = exp(K eps) - 1 (nonlinear, default)
or K eps (linear; problem_data['stress_relation']='linear').

f-wave decomposition of the flux jump df = (-(u_r-u_l), -(sig_r-sig_l))
against the one-sided eigenvectors r- = (1, Z_l), r+ = (1, -Z_r) with
impedance Z = sqrt(rho sigma_eps) and speeds -c_l / +c_r:

    beta1 = (df2 + Z_r df1) / (Z_l + Z_r)
    beta2 = (Z_l df1 - df2) / (Z_l + Z_r)
    amdq = beta1 r-,  apdq = beta2 r+

Use with solver.fwave = True.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_psystem(ixy, q_l, q_r, aux_l, aux_r, params):
    linear = params.get("stress_relation", "exp") == "linear"
    rho_l, K_l = aux_l[0], aux_l[1]
    rho_r, K_r = aux_r[0], aux_r[1]
    eps_l, m_l = q_l[0], q_l[1]
    eps_r, m_r = q_r[0], q_r[1]
    u_l = m_l / rho_l
    u_r = m_r / rho_r

    if linear:
        sig_l = K_l * eps_l
        sig_r = K_r * eps_r
        sigp_l = K_l
        sigp_r = K_r
    else:
        sig_l = jnp.exp(K_l * eps_l) - 1.0
        sig_r = jnp.exp(K_r * eps_r) - 1.0
        sigp_l = K_l * jnp.exp(K_l * eps_l)
        sigp_r = K_r * jnp.exp(K_r * eps_r)

    z_l = jnp.sqrt(rho_l * sigp_l)
    z_r = jnp.sqrt(rho_r * sigp_r)
    c_l = jnp.sqrt(sigp_l / rho_l)
    c_r = jnp.sqrt(sigp_r / rho_r)

    df1 = -(u_r - u_l)
    df2 = -(sig_r - sig_l)
    denom = z_l + z_r
    b1 = (df2 + z_r * df1) / denom
    b2 = (z_l * df1 - df2) / denom

    w1 = jnp.stack([b1, b1 * z_l])
    w2 = jnp.stack([b2, -b2 * z_r])
    wave = jnp.stack([w1, w2], axis=1)
    s = jnp.stack([-c_l, c_r])
    amdq = w1
    apdq = w2
    return wave, s, amdq, apdq


from . import RiemannSolver  # noqa: E402

psystem_1D = RiemannSolver("psystem_1D", 1, 2, 2, _rp_psystem)
