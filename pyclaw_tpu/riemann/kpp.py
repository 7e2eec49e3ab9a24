"""KPP rotating-wave Riemann solver (2D scalar, nonconvex flux).

Physics parity with reference ``riemann/src/rpn2_kpp.f90`` (SURVEY.md §2.8
long tail): q_t + sin(q)_x + cos(q)_y = 0.  Local-Lax-Friedrichs-type
upwinding per interface (the reference uses a simple characteristic-speed
solver; LLF is the robust choice for the nonconvex flux).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_kpp(ixy, q_l, q_r, aux_l, aux_r, params):
    if ixy == 0:
        f = jnp.sin
        df = jnp.cos
    else:
        f = jnp.cos
        def df(q):
            return -jnp.sin(q)

    dq = q_r - q_l
    savg = 0.5 * (df(q_l[0]) + df(q_r[0]))
    # NONCONVEX flux: |f'| can peak strictly inside [q_l, q_r], so
    # endpoint-based dissipation underestimates.  |sin'|,|cos'| <= 1
    # globally -> Rusanov with the global bound is monotone.
    alpha = jnp.ones_like(savg)
    # report the signed max-magnitude speed so the CFL limit covers the
    # dissipation coefficient (monotonicity bound)
    s = jnp.where(savg >= 0.0, alpha, -alpha)
    dflux = f(q_r) - f(q_l)
    # LLF splitting: amdq + apdq = dflux, dissipation alpha*dq
    amdq = 0.5 * (dflux - alpha * dq)
    apdq = 0.5 * (dflux + alpha * dq)
    wave = dq[:, None]
    return wave, s[None], amdq, apdq


def _rpt_kpp(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params):
    # transverse characteristic speed at the Roe average
    qa = 0.5 * (q_l[0] + q_r[0])
    ut = jnp.cos(qa) if ixy == 0 else -jnp.sin(qa)
    bmasdq = jnp.minimum(ut, 0.0) * asdq
    bpasdq = jnp.maximum(ut, 0.0) * asdq
    return bmasdq, bpasdq


from . import RiemannSolver  # noqa: E402

kpp_2D = RiemannSolver("kpp_2D", 2, 1, 1, _rp_kpp, rpt=_rpt_kpp)
