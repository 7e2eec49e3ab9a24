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


def _rpt_burgers(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params,
                 trans_axis=None):
    """Transverse splitter (reference rpt2_burgers.f90): the fluctuation
    entering cell i1 is split by the sign of that cell's own state (the
    transverse characteristic speed of the multi-D Burgers flux
    q^2/2 per direction)."""
    qc = (q_l if imp == 1 else q_r)[0]
    bmasdq = jnp.minimum(qc, 0.0) * asdq
    bpasdq = jnp.maximum(qc, 0.0) * asdq
    return bmasdq, bpasdq


def _rptt_burgers(ixy, icoor, imp, impt, q_l, q_r, aux_l, aux_r, bsasdq,
                  params, trans_axis=None):
    return _rpt_burgers(ixy, imp, q_l, q_r, aux_l, aux_r, bsasdq, params,
                        trans_axis=trans_axis)


def _flux_burgers(ixy, q, aux, params):
    """f = q^2/2 (RiemannSolver.flux protocol)."""
    return 0.5 * q * q


from . import RiemannSolver  # noqa: E402

burgers_1D = RiemannSolver("burgers_1D", 1, 1, 1, _rp_burgers)
burgers_2D = RiemannSolver("burgers_2D", 2, 1, 1, _rp_burgers,
                           rpt=_rpt_burgers)
burgers_3D = RiemannSolver("burgers_3D", 3, 1, 1, _rp_burgers,
                           rpt=_rpt_burgers, rptt=_rptt_burgers)
for _s in (burgers_1D, burgers_2D, burgers_3D):
    _s.flux = _flux_burgers
