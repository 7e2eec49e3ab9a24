"""Burgers equation Riemann solver.

Physics parity with reference ``riemann/src/rp1_burgers.f90`` (:~1-40) and
``riemann/riemann/burgers_1D_py.py`` (SURVEY.md §2.8):
q_t + (q^2/2)_x = 0; one wave W = q_r - q_l with Roe speed s = (q_l+q_r)/2,
plus an entropy fix for transonic rarefactions (q_l < 0 < q_r), enabled via
problem_data['efix'] (default True).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_burgers(ixy, q_l, q_r, aux_l, aux_r, params):
    dq = q_r - q_l
    s = 0.5 * (q_l[0] + q_r[0])
    wave = dq[:, None]

    amdq = jnp.minimum(s, 0.0) * dq
    apdq = jnp.maximum(s, 0.0) * dq

    if params.get("efix", True):
        transonic = (q_l[0] < 0.0) & (q_r[0] > 0.0)
        amdq = jnp.where(transonic, -0.5 * q_l * q_l, amdq)
        apdq = jnp.where(transonic, 0.5 * q_r * q_r, apdq)
    return wave, s[None], amdq, apdq


from . import RiemannSolver  # noqa: E402

burgers_1D = RiemannSolver("burgers_1D", 1, 1, 1, _rp_burgers)
