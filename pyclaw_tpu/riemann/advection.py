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
                    bsasdq, params, trans_axis=None):
    # double-transverse split along `trans_axis` (the third coordinate)
    names = ("u", "v", "w")
    if trans_axis is None:
        trans_axis = [d for d in range(3) if d != ixy][icoor - 2] \
            if icoor >= 2 else (ixy + 2) % 3
    ut = params[names[trans_axis]]
    cmbsasdq = jnp.minimum(ut, 0.0) * bsasdq
    cpbsasdq = jnp.maximum(ut, 0.0) * bsasdq
    return cmbsasdq, cpbsasdq


def _rpt_vc_advection(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params,
                      trans_axis=None):
    """Variable-coefficient transverse splitter (reference
    rpt2_vc_advection.f90): the fluctuation entering cell i1 (left cell for
    imp=1, right for imp=2) is split by the transverse EDGE velocities of
    that cell — aux[kv] at its lower transverse edge for the down-going
    part, and the next cell's aux[kv] (its upper edge) for the up-going
    part.  The aux arrays passed in are sliced only along the normal axis,
    so the transverse neighbours are plain shifts; the wrapped edge rows
    are never read by the scatter (it drops the first/last transverse row).
    """
    if trans_axis is None:
        trans_axis = 1 - ixy
    aux_c = aux_l if imp == 1 else aux_r
    v_lo = aux_c[trans_axis]                       # receiving cell's lower edge
    v_hi = jnp.roll(v_lo, -1, axis=trans_axis)     # its upper edge
    bmasdq = jnp.minimum(v_lo, 0.0) * asdq
    bpasdq = jnp.maximum(v_hi, 0.0) * asdq
    return bmasdq, bpasdq


def _rp_vc_advection(ixy, q_l, q_r, aux_l, aux_r, params):
    """Variable-coefficient COLOR-equation advection q_t + u(x) q_x = 0:
    aux[ixy] holds the edge velocity at each cell's lower interface
    (reference rp1_vc_advection.f90 / rpn2_vc_advection.f90).  Not in
    conservation form — use the fwave variant for q_t + (u q)_x = 0."""
    u = aux_r[ixy]          # velocity at the shared interface
    dq = q_r - q_l
    return _upwind(dq, u)


def _rp_vc_advection_fwave(ixy, q_l, q_r, aux_l, aux_r, params):
    """f-wave solver for CONSERVATIVE variable-coefficient advection
    q_t + (u(x) q)_x = 0 with CELL-CENTERED velocities aux[ixy] (SURVEY.md
    §2.8 fwave variant for spatially-varying flux): the wave carries the
    full flux difference Z = u_r q_r - u_l q_l, so the scheme telescopes
    exactly (conservation to roundoff).  Use with solver.fwave = True."""
    u_l, u_r = aux_l[ixy], aux_r[ixy]
    z = u_r * q_r - u_l * q_l
    s = 0.5 * (u_l + u_r)
    wave = z[:, None]
    amdq = jnp.where(s < 0.0, z, jnp.zeros_like(z))
    apdq = jnp.where(s >= 0.0, z, jnp.zeros_like(z))
    return wave, s[None], amdq, apdq


def _flux_advection(ixy, q, aux, params):
    """f = u_ixy * q (RiemannSolver.flux protocol)."""
    return params[("u", "v", "w")[ixy]] * q


from . import RiemannSolver  # noqa: E402

advection_1D = RiemannSolver("advection_1D", 1, 1, 1, _rp_advection,
                             requires=("u",))
advection_2D = RiemannSolver("advection_2D", 2, 1, 1, _rp_advection,
                             rpt=_rpt_advection, requires=("u", "v"))
advection_3D = RiemannSolver("advection_3D", 3, 1, 1, _rp_advection,
                             rpt=_rpt_advection, rptt=_rptt_advection,
                             requires=("u", "v", "w"))
for _s in (advection_1D, advection_2D, advection_3D):
    _s.flux = _flux_advection
vc_advection_1D = RiemannSolver("vc_advection_1D", 1, 1, 1, _rp_vc_advection)
vc_advection_fwave_1D = RiemannSolver("vc_advection_fwave_1D", 1, 1, 1,
                                      _rp_vc_advection_fwave)
vc_advection_2D = RiemannSolver("vc_advection_2D", 2, 1, 1, _rp_vc_advection,
                                rpt=_rpt_vc_advection)
vc_advection_fwave_2D = RiemannSolver("vc_advection_fwave_2D", 2, 1, 1,
                                      _rp_vc_advection_fwave,
                                      rpt=_rpt_vc_advection)
