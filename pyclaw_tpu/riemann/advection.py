"""Advection Riemann solvers (constant and variable coefficient).

Physics parity with reference ``riemann/src/rp1_advection.f90`` (:~1-40),
``rpn2_vc_advection.f90``, and the vectorized Python spec
``riemann/riemann/advection_1D_py.py`` (SURVEY.md §2.8): scalar color
equation q_t + u q_x = 0; one wave W = q_r - q_l with speed u; fluctuations
are the upwind splits  amdq = min(u,0) W,  apdq = max(u,0) W.
"""

from __future__ import annotations

import jax.numpy as jnp


def _upwind(dq, s):
    wave = dq[:, None]                      # (1, 1, *n)
    amdq = jnp.minimum(s, 0.0) * dq
    apdq = jnp.maximum(s, 0.0) * dq
    return wave, s[None], amdq, apdq


def _rp_advection(ixy, q_l, q_r, aux_l, aux_r, params):
    u = params[("u", "v", "w")[ixy]]
    dq = q_r - q_l
    s = jnp.full_like(dq[0], u)
    return _upwind(dq, s)


def _rpt_advection(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params,
                   trans_axis=None):
    # transverse velocity: the speed along `trans_axis` (default: the other
    # coordinate in 2D)
    names = ("u", "v", "w")
    if trans_axis is None:
        trans_axis = 1 - ixy
    ut = params[names[trans_axis]]
    bmasdq = jnp.minimum(ut, 0.0) * asdq
    bpasdq = jnp.maximum(ut, 0.0) * asdq
    return bmasdq, bpasdq


def _rptt_advection(ixy, icoor, imp, impt, q_l, q_r, aux_l, aux_r,
                    bsasdq, params):
    # double-transverse split in the third coordinate direction
    names = ("u", "v", "w")
    # directions: ixy is normal; icoor selects which transverse axis (2 or 3)
    other = [d for d in range(3) if d != ixy]
    ut = params[names[other[icoor - 2]]] if icoor >= 2 else params[names[other[0]]]
    cmbsasdq = jnp.minimum(ut, 0.0) * bsasdq
    cpbsasdq = jnp.maximum(ut, 0.0) * bsasdq
    return cmbsasdq, cpbsasdq


def _rp_vc_advection(ixy, q_l, q_r, aux_l, aux_r, params):
    """Variable-coefficient (color equation) advection: aux[ixy] holds the
    edge velocity at each cell's lower interface (reference
    rp1_vc_advection.f90 / rpn2_vc_advection.f90)."""
    u = aux_r[ixy]          # velocity at the shared interface
    dq = q_r - q_l
    return _upwind(dq, u)


from . import RiemannSolver  # noqa: E402

advection_1D = RiemannSolver("advection_1D", 1, 1, 1, _rp_advection,
                             requires=("u",))
advection_2D = RiemannSolver("advection_2D", 2, 1, 1, _rp_advection,
                             rpt=_rpt_advection, requires=("u", "v"))
advection_3D = RiemannSolver("advection_3D", 3, 1, 1, _rp_advection,
                             rpt=_rpt_advection, rptt=_rptt_advection,
                             requires=("u", "v", "w"))
vc_advection_1D = RiemannSolver("vc_advection_1D", 1, 1, 1, _rp_vc_advection)
