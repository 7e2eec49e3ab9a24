"""Linear acoustics Riemann solvers (1D/2D/3D).

Physics parity with reference ``riemann/src/rp1_acoustics.f90`` (:~1-60),
``rpn2_acoustics.f90`` + ``rpt2_acoustics.f90`` (:~1-80/:~1-70) and the
vectorized Python spec ``riemann/riemann/acoustics_1D_py.py`` (SURVEY.md
§2.8).  System: p_t + K div(u) = 0, rho u_t + grad p = 0 with impedance
Z = sqrt(rho*K) and sound speed c = sqrt(K/rho) from problem_data
{'rho', 'bulk'} (or precomputed {'zz','cc'}).

q layout: 1D (p, u); 2D (p, u, v); 3D (p, u, v, w).  num_waves = 2
(the +-c acoustic waves; shear carries nothing in linear acoustics).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _zc(params):
    if "zz" in params:
        return params["zz"], params["cc"]
    rho, bulk = params["rho"], params["bulk"]
    return math.sqrt(rho * bulk), math.sqrt(bulk / rho)


def _rp_acoustics(ixy, q_l, q_r, aux_l, aux_r, params):
    zz, cc = _zc(params)
    num_eqn = q_l.shape[0]
    mu = 1 + ixy                     # normal-velocity component
    dq = q_r - q_l
    a1 = (-dq[0] + zz * dq[mu]) / (2.0 * zz)    # left-going strength
    a2 = (dq[0] + zz * dq[mu]) / (2.0 * zz)     # right-going strength

    # stack-assembled (identical values to a zeros+.at[].set build;
    # multi-index .at lowers to a scatter, which Mosaic cannot lower
    # inside the Pallas kernels — round 5)
    zero = jnp.zeros_like(a1)
    w1 = [zero] * num_eqn
    w1[0], w1[mu] = -a1 * zz, a1
    w2 = [zero] * num_eqn
    w2[0], w2[mu] = a2 * zz, a2
    wave = jnp.stack([jnp.stack(w1), jnp.stack(w2)], axis=1)

    shape = dq.shape[1:]
    s = jnp.stack([jnp.full(shape, -cc, dq.dtype),
                   jnp.full(shape, cc, dq.dtype)])
    amdq = -cc * wave[:, 0]
    apdq = cc * wave[:, 1]
    return wave, s, amdq, apdq


def _rpt_acoustics(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params):
    """Split the fluctuation asdq into transverse-going parts
    (reference rpt2_acoustics.f90)."""
    zz, cc = _zc(params)
    mv = 2 - ixy if asdq.shape[0] == 3 else None   # 2D transverse component
    if mv is None:
        raise ValueError("rpt2 acoustics expects 3-component q")
    a1 = (-asdq[0] + zz * asdq[mv]) / (2.0 * zz)   # down-going
    a2 = (asdq[0] + zz * asdq[mv]) / (2.0 * zz)    # up-going

    zero = jnp.zeros_like(a1)
    bm = [zero] * asdq.shape[0]
    bm[0], bm[mv] = cc * a1 * zz, -cc * a1         # -c * (-Z a1)
    bp = [zero] * asdq.shape[0]
    bp[0], bp[mv] = cc * a2 * zz, cc * a2
    return jnp.stack(bm), jnp.stack(bp)


# ---- SoA fast-path variants (classic/soa.py protocol) ----------------
def _rp_acoustics_soa(ixy, q_l, q_r, params):
    zz, cc = _zc(params)
    mu = 1 + ixy
    dp = q_r[0] - q_l[0]
    dv = q_r[mu] - q_l[mu]
    a1 = (-dp + zz * dv) / (2.0 * zz)
    a2 = (dp + zz * dv) / (2.0 * zz)

    def mk(p_c, u_c):
        comp = [None] * len(q_l)
        comp[0] = p_c
        comp[mu] = u_c
        return tuple(comp)

    waves = (mk(-a1 * zz, a1), mk(a2 * zz, a2))
    speeds = (-cc, cc)          # weak-typed scalars: fuse, no broadcast
    return waves, speeds


def _rpt_acoustics_soa(ixy, imp, q_l, q_r, asdq, params):
    zz, cc = _zc(params)
    mv = 2 - ixy
    a1 = (-asdq[0] + zz * asdq[mv]) / (2.0 * zz)
    a2 = (asdq[0] + zz * asdq[mv]) / (2.0 * zz)
    zero = jnp.zeros_like(asdq[0])
    bm = [zero] * len(q_l)
    bp = [zero] * len(q_l)
    bm[0] = cc * a1 * zz
    bm[mv] = -cc * a1
    bp[0] = cc * a2 * zz
    bp[mv] = cc * a2
    return tuple(bm), tuple(bp)


def _rpt3_acoustics(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params,
                    trans_axis=None):
    """3D transverse split along `trans_axis` (defaults to the next axis)."""
    zz, cc = _zc(params)
    if trans_axis is None:
        trans_axis = (ixy + 1) % 3
    mv = 1 + trans_axis
    a1 = (-asdq[0] + zz * asdq[mv]) / (2.0 * zz)
    a2 = (asdq[0] + zz * asdq[mv]) / (2.0 * zz)
    zero = jnp.zeros_like(a1)
    bm = [zero] * asdq.shape[0]
    bm[0], bm[mv] = cc * a1 * zz, -cc * a1
    bp = [zero] * asdq.shape[0]
    bp[0], bp[mv] = cc * a2 * zz, cc * a2
    return jnp.stack(bm), jnp.stack(bp)


def _evec_acoustics(ixy, q, aux, params):
    """Eigenvector matrices of the acoustics flux Jacobian along axis
    `ixy` (reference sharpclaw evec hook; char_decomp): acoustic waves
    (-Z, e_mu) / (+Z, e_mu), shear components pass through unchanged."""
    import numpy as np
    zz, cc = _zc(params)
    n = q.shape[0]
    mu = 1 + ixy
    R = np.eye(n)
    L = np.eye(n)
    # column 0: left-going wave; column n-1: right-going wave
    R[:, 0] = 0.0
    R[:, n - 1] = 0.0
    R[0, 0], R[mu, 0] = -zz, 1.0
    R[0, n - 1], R[mu, n - 1] = zz, 1.0
    # shear components occupy the middle columns
    shear = [j for j in range(1, n) if j != mu]
    for col, j in zip(range(1, n - 1), shear):
        R[:, col] = 0.0
        R[j, col] = 1.0
    L[:] = np.linalg.inv(R)
    dtype = q.dtype
    return jnp.asarray(R, dtype=dtype), jnp.asarray(L, dtype=dtype)


def _flux_acoustics(ixy, q, aux, params):
    """Linear acoustic flux along ixy: f = [K u_n, p/rho, 0...] with
    K = zz*cc, rho = zz/cc (RiemannSolver.flux protocol)."""
    zz, cc = _zc(params)
    mu = 1 + ixy
    zero = jnp.zeros_like(q[0])
    f = [zero] * q.shape[0]
    f[0], f[mu] = (zz * cc) * q[mu], (cc / zz) * q[0]
    return jnp.stack(f)


def _flux_acoustics_soa(ixy, qs, params):
    zz, cc = _zc(params)
    mu = 1 + ixy
    comp = [None] * len(qs)
    comp[0] = (zz * cc) * qs[mu]
    comp[mu] = (cc / zz) * qs[0]
    return tuple(comp)


from . import RiemannSolver  # noqa: E402

acoustics_1D = RiemannSolver("acoustics_1D", 1, 2, 2, _rp_acoustics)
acoustics_1D.flux = _flux_acoustics
acoustics_1D.evec = _evec_acoustics
acoustics_2D = RiemannSolver("acoustics_2D", 2, 3, 2, _rp_acoustics,
                             rpt=_rpt_acoustics)
acoustics_2D.evec = _evec_acoustics
acoustics_2D.rpn_soa = _rp_acoustics_soa
acoustics_2D.rpt_soa = _rpt_acoustics_soa
acoustics_2D.flux = _flux_acoustics
acoustics_2D.flux_soa = _flux_acoustics_soa
def _rptt3_acoustics(ixy, icoor, imp, impt, q_l, q_r, aux_l, aux_r,
                     bsasdq, params, trans_axis=None):
    """Double-transverse acoustic split: same eigenstructure, applied
    along the third axis (reference rptt3_acoustics)."""
    if trans_axis is None:
        trans_axis = (ixy + 2) % 3
    return _rpt3_acoustics(ixy, imp, q_l, q_r, aux_l, aux_r, bsasdq,
                           params, trans_axis=trans_axis)


acoustics_3D = RiemannSolver("acoustics_3D", 3, 4, 2, _rp_acoustics,
                             rpt=_rpt3_acoustics, rptt=_rptt3_acoustics)
acoustics_3D.evec = _evec_acoustics
acoustics_3D.flux = _flux_acoustics
