"""Variable-coefficient (heterogeneous-media) acoustics Riemann solvers.

Physics parity with reference ``riemann/src/rp1_acoustics_var.f90`` and
``rpn2_vc_acoustics.f90`` (examples acoustics_1d_heterogeneous /
acoustics_2d_variable; SURVEY.md §2.8): per-cell material parameters in
aux — aux[0] = impedance Z, aux[1] = sound speed c.  At an interface the
jump splits against the one-sided impedances:

    a1 = (-dp + Z_r du) / (Z_l + Z_r)     left-going,  speed -c_l
    a2 = ( dp + Z_l du) / (Z_l + Z_r)     right-going, speed +c_r
    W1 = a1 (-Z_l, n),  W2 = a2 (Z_r, n)
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_acoustics_var(ixy, q_l, q_r, aux_l, aux_r, params):
    num_eqn = q_l.shape[0]
    mu = 1 + ixy
    z_l, c_l = aux_l[0], aux_l[1]
    z_r, c_r = aux_r[0], aux_r[1]
    d = q_r - q_l
    denom = z_l + z_r
    a1 = (-d[0] + z_r * d[mu]) / denom
    a2 = (d[0] + z_l * d[mu]) / denom

    # stack-assembled (multi-index .at lowers to a scatter, which the
    # Pallas TPU lowering cannot handle — round 5; identical values)
    zero = jnp.zeros_like(a1)
    w1 = [zero] * num_eqn
    w1[0], w1[mu] = -a1 * z_l, a1
    w2 = [zero] * num_eqn
    w2[0], w2[mu] = a2 * z_r, a2
    wave = jnp.stack([jnp.stack(w1), jnp.stack(w2)], axis=1)

    s = jnp.stack([-c_l, c_r])
    amdq = -c_l * wave[:, 0]
    apdq = c_r * wave[:, 1]
    return wave, s, amdq, apdq


def _rpt_acoustics_var(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params,
                       trans_axis=None):
    """Heterogeneous-media transverse splitter (reference
    rpt2_vc_acoustics.f90): the fluctuation entering cell i1 (= left cell
    for imp=1, right for imp=2) is decomposed against the impedances of
    the transverse-neighbour cells — the down-going wave crosses into the
    cell below (impedance Z_below, speed c_below), the up-going into the
    cell above:

        a1 = (-dp + Z dv) / (Z + Z_below),   bmasdq = -c_below a1 (-Z_below, 0, 1)
        a2 = ( dp + Z dv) / (Z + Z_above),   bpasdq =  c_above a2 ( Z_above, 0, 1)

    aux arrays are sliced only along the normal axis, so the transverse
    neighbours are plain shifts; the wrapped edge rows are never read by
    the transverse scatter (it drops the first/last transverse row).
    """
    if trans_axis is None:
        trans_axis = 1 - ixy
    mv = 1 + trans_axis
    aux_c = aux_l if imp == 1 else aux_r
    z_c = aux_c[0]
    z_below = jnp.roll(z_c, 1, axis=trans_axis)
    z_above = jnp.roll(z_c, -1, axis=trans_axis)
    c_below = jnp.roll(aux_c[1], 1, axis=trans_axis)
    c_above = jnp.roll(aux_c[1], -1, axis=trans_axis)

    a1 = (-asdq[0] + z_c * asdq[mv]) / (z_c + z_below)
    a2 = (asdq[0] + z_c * asdq[mv]) / (z_c + z_above)

    zero = jnp.zeros_like(a1)
    bm = [zero] * asdq.shape[0]
    bm[0], bm[mv] = c_below * a1 * z_below, -c_below * a1
    bp = [zero] * asdq.shape[0]
    bp[0], bp[mv] = c_above * a2 * z_above, c_above * a2
    return jnp.stack(bm), jnp.stack(bp)


def _evec_acoustics_var(ixy, q, aux, params):
    """Per-cell eigenvector matrices for heterogeneous acoustics
    (char_decomp with spatially-varying impedance aux[0])."""
    z = aux[0]
    num_eqn = q.shape[0]
    mu = 1 + ixy
    one = jnp.ones_like(z)
    shape = (num_eqn, num_eqn) + z.shape
    R = jnp.zeros(shape, dtype=q.dtype)
    L = jnp.zeros(shape, dtype=q.dtype)
    R = R.at[0, 0].set(-z).at[mu, 0].set(one)
    R = R.at[0, num_eqn - 1].set(z).at[mu, num_eqn - 1].set(one)
    L = L.at[0, 0].set(-0.5 / z).at[0, mu].set(0.5 * one)
    L = L.at[num_eqn - 1, 0].set(0.5 / z).at[num_eqn - 1, mu].set(0.5 * one)
    shear = [j for j in range(1, num_eqn) if j != mu]
    for k, j in zip(range(1, num_eqn - 1), shear):
        R = R.at[j, k].set(one)
        L = L.at[k, j].set(one)
    return R, L


from . import RiemannSolver  # noqa: E402

acoustics_variable_1D = RiemannSolver("acoustics_variable_1D", 1, 2, 2,
                                      _rp_acoustics_var)
acoustics_variable_1D.evec = _evec_acoustics_var
vc_acoustics_2D = RiemannSolver("vc_acoustics_2D", 2, 3, 2,
                                _rp_acoustics_var, rpt=_rpt_acoustics_var)
vc_acoustics_2D.evec = _evec_acoustics_var
# 3D heterogeneous acoustics: q=(p,u,v,w), same per-cell (Z,c) aux rows;
# the transverse splitter is axis-generic (trans_axis).  No rptt (the
# reference has no vc double-transverse solver either): pairwise CTU via
# transverse_waves=1.
vc_acoustics_3D = RiemannSolver("vc_acoustics_3D", 3, 4, 2,
                                _rp_acoustics_var, rpt=_rpt_acoustics_var)
vc_acoustics_3D.evec = _evec_acoustics_var
