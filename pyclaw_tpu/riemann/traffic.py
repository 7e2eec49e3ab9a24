"""LWR traffic-flow Riemann solver.

Physics parity with reference ``riemann/src/rp1_traffic.f90`` (SURVEY.md
§2.8 long tail): q_t + (q(1-q))_x = 0 (umax=1 normalization), Godunov
upwinding with transonic-rarefaction entropy fix at the sonic point
q = 1/2.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_traffic(ixy, q_l, q_r, aux_l, aux_r, params):
    umax = params.get("efix_umax", params.get("umax", 1.0))

    def f(q):
        return umax * q * (1.0 - q)

    dq = q_r - q_l
    # characteristic speed f'(q) = umax(1-2q); Roe-average speed:
    s = umax * (1.0 - (q_l[0] + q_r[0]))
    wave = dq[:, None]

    df = f(q_r) - f(q_l)
    amdq = jnp.where(s < 0.0, df, jnp.zeros_like(df))
    apdq = jnp.where(s >= 0.0, df, jnp.zeros_like(df))
    # transonic rarefaction: f'(q_l) < 0 < f'(q_r)  (q_l > 1/2 > q_r)
    transonic = (q_l[0] > 0.5) & (q_r[0] < 0.5)
    f_sonic = f(jnp.full_like(q_l, 0.5))
    amdq = jnp.where(transonic, f_sonic - f(q_l), amdq)
    apdq = jnp.where(transonic, f(q_r) - f_sonic, apdq)
    return wave, s[None], amdq, apdq


def _flux_traffic(ixy, q, aux, params):
    """f = umax q (1-q) (RiemannSolver.flux protocol)."""
    umax = params.get("efix_umax", params.get("umax", 1.0))
    return umax * q * (1.0 - q)


from . import RiemannSolver  # noqa: E402

traffic_1D = RiemannSolver("traffic_1D", 1, 1, 1, _rp_traffic)
traffic_1D.flux = _flux_traffic
