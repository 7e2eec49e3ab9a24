"""2D nonlinear p-system Riemann solver (f-wave, heterogeneous media).

Physics parity with reference ``riemann/src/rp2_psystem.f90`` /
psystem_2d example (SURVEY.md §2.8): q = (eps, rho*u, rho*v) with
    eps_t - u_x - v_y = 0
    (rho u)_t - sigma(eps, x, y)_x = 0
    (rho v)_t - sigma(eps, x, y)_y = 0
aux = (rho, K); sigma = exp(K eps) - 1 or K eps.  Normal f-wave solve as
in the 1D solver (momentum component mu = 1 + ixy); the transverse
velocity component rides passively.  Use with solver.fwave = True.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rpn2_psystem(ixy, q_l, q_r, aux_l, aux_r, params):
    linear = params.get("stress_relation", "exp") == "linear"
    mu = 1 + ixy
    rho_l, K_l = aux_l[0], aux_l[1]
    rho_r, K_r = aux_r[0], aux_r[1]
    eps_l, eps_r = q_l[0], q_r[0]
    u_l = q_l[mu] / rho_l
    u_r = q_r[mu] / rho_r

    if linear:
        sig_l, sig_r = K_l * eps_l, K_r * eps_r
        sigp_l, sigp_r = K_l, K_r
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

    num_eqn = q_l.shape[0]
    z = jnp.zeros(df1.shape, q_l.dtype)

    def mk(e_c, m_c):
        comp = [z] * num_eqn
        comp[0] = e_c
        comp[mu] = m_c
        return jnp.stack(comp)

    w1 = mk(b1, b1 * z_l)
    w2 = mk(b2, -b2 * z_r)
    wave = jnp.stack([w1, w2], axis=1)
    s = jnp.stack([-c_l, c_r])
    return wave, s, w1, w2


from . import RiemannSolver  # noqa: E402

psystem_2D = RiemannSolver("psystem_2D", 2, 3, 2, _rpn2_psystem)
