"""Shallow-water Riemann solvers.

Physics parity with reference ``riemann/src/rp1_shallow_roe_with_efix.f90``
(:~1-100), ``rpn2_shallow_roe_with_efix.f90`` + ``rpt2_shallow_roe_with_
efix.f90`` (:~1-130/110), and ``riemann/riemann/shallow_1D_py.py``
(SURVEY.md §2.8).  System (1D): h_t + (hu)_x = 0,
(hu)_t + (hu^2 + g h^2/2)_x = 0, with g = problem_data['grav'].

Roe averages:  u_hat = (sqrt(h_l) u_l + sqrt(h_r) u_r)/(sqrt(h_l)+sqrt(h_r)),
c_hat = sqrt(g (h_l+h_r)/2).  Harten entropy fix on both acoustic waves.
2D adds the shear wave (speed u_hat) and the transverse splitter.

DRY STATES (h = 0): exactly as in the reference solvers, the Roe/HLLE
paths in this module divide by h in the velocity recovery and produce
inf/nan on dry cells — dry and wetting/drying problems are supported
ONLY through the augmented solvers (``sw_aug_1D``/``sw_aug_2D`` below,
exercised by tests/test_sw_aug_dry.py).  The one
exception is ``RiemannSolver.flux`` (used by SharpClaw's internal
flux-difference fluctuation), which where-guards h = 0 so a dry cell
inside an otherwise-wet SharpClaw domain yields zero flux rather than
nan; the guard is NOT replicated in the wave decompositions because a
dry cell there is unrecoverable anyway (the Roe average itself is
undefined) and the extra selects would tax every wet-state run.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp1_shallow_roe(ixy, q_l, q_r, aux_l, aux_r, params, efix=True):
    g = params["grav"]
    h_l, h_r = q_l[0], q_r[0]
    hu_l, hu_r = q_l[1], q_r[1]
    u_l, u_r = hu_l / h_l, hu_r / h_r

    sh_l, sh_r = jnp.sqrt(h_l), jnp.sqrt(h_r)
    u = (sh_l * u_l + sh_r * u_r) / (sh_l + sh_r)
    c = jnp.sqrt(g * 0.5 * (h_l + h_r))

    d = q_r - q_l
    a1 = 0.5 * ((u + c) * d[0] - d[1]) / c
    a2 = 0.5 * (-(u - c) * d[0] + d[1]) / c

    w1 = jnp.stack([a1, a1 * (u - c)])
    w2 = jnp.stack([a2, a2 * (u + c)])
    wave = jnp.stack([w1, w2], axis=1)
    s = jnp.stack([u - c, u + c])

    if not efix:
        amdq = jnp.minimum(s[0], 0.0) * w1 + jnp.minimum(s[1], 0.0) * w2
        apdq = jnp.maximum(s[0], 0.0) * w1 + jnp.maximum(s[1], 0.0) * w2
        return wave, s, amdq, apdq

    # Harten entropy fix (transonic rarefactions)
    c_l = jnp.sqrt(g * h_l)
    c_r = jnp.sqrt(g * h_r)
    # state between the waves
    hm = h_l + a1
    hum = hu_l + a1 * (u - c)
    um = hum / jnp.where(hm <= 0.0, 1.0, hm)
    cm = jnp.sqrt(g * jnp.maximum(hm, 0.0))

    lam1_l = u_l - c_l
    lam1_m = um - cm
    trans1 = (lam1_l < 0.0) & (lam1_m > 0.0)
    den1 = jnp.where(lam1_m - lam1_l == 0.0, 1.0, lam1_m - lam1_l)
    sf1 = jnp.where(trans1, lam1_l * (lam1_m - s[0]) / den1,
                    jnp.minimum(s[0], 0.0))

    lam2_m = um + cm
    lam2_r = u_r + c_r
    trans2 = (lam2_m < 0.0) & (lam2_r > 0.0)
    den2 = jnp.where(lam2_r - lam2_m == 0.0, 1.0, lam2_r - lam2_m)
    sf2 = jnp.where(trans2, lam2_m * (lam2_r - s[1]) / den2,
                    jnp.minimum(s[1], 0.0))

    amdq = sf1 * w1 + sf2 * w2
    df = s[0] * w1 + s[1] * w2
    apdq = df - amdq
    return wave, s, amdq, apdq


def _rp1_shallow_with_efix(ixy, q_l, q_r, aux_l, aux_r, params):
    return _rp1_shallow_roe(ixy, q_l, q_r, aux_l, aux_r, params, efix=True)


def _rp1_shallow_hlle(ixy, q_l, q_r, aux_l, aux_r, params):
    g = params["grav"]
    h_l, h_r = q_l[0], q_r[0]
    u_l, u_r = q_l[1] / h_l, q_r[1] / h_r
    c_l = jnp.sqrt(g * h_l)
    c_r = jnp.sqrt(g * h_r)
    sh_l, sh_r = jnp.sqrt(h_l), jnp.sqrt(h_r)
    u = (sh_l * u_l + sh_r * u_r) / (sh_l + sh_r)
    c = jnp.sqrt(g * 0.5 * (h_l + h_r))

    s1 = jnp.minimum(u - c, u_l - c_l)
    s2 = jnp.maximum(u + c, u_r + c_r)
    f_l = jnp.stack([q_l[1], h_l * u_l * u_l + 0.5 * g * h_l * h_l])
    f_r = jnp.stack([q_r[1], h_r * u_r * u_r + 0.5 * g * h_r * h_r])
    denom = jnp.where(s2 - s1 == 0.0, 1.0, s2 - s1)
    q_m = (s2 * q_r - s1 * q_l - (f_r - f_l)) / denom

    wave = jnp.stack([q_m - q_l, q_r - q_m], axis=1)
    s = jnp.stack([s1, s2])
    amdq = jnp.minimum(s1, 0.0) * wave[:, 0] + jnp.minimum(s2, 0.0) * wave[:, 1]
    apdq = jnp.maximum(s1, 0.0) * wave[:, 0] + jnp.maximum(s2, 0.0) * wave[:, 1]
    return wave, s, amdq, apdq


# ======================================================================
# 2D Roe solver with shear wave + entropy fix
# ======================================================================
def _rpn2_shallow_roe(ixy, q_l, q_r, aux_l, aux_r, params):
    g = params["grav"]
    mu = 1 + ixy
    mv = 2 - ixy
    h_l, h_r = q_l[0], q_r[0]
    u_l, u_r = q_l[mu] / h_l, q_r[mu] / h_r
    v_l, v_r = q_l[mv] / h_l, q_r[mv] / h_r

    sh_l, sh_r = jnp.sqrt(h_l), jnp.sqrt(h_r)
    wgt = 1.0 / (sh_l + sh_r)
    u = (sh_l * u_l + sh_r * u_r) * wgt
    v = (sh_l * v_l + sh_r * v_r) * wgt
    c = jnp.sqrt(g * 0.5 * (h_l + h_r))

    d0 = q_r[0] - q_l[0]
    dmu = q_r[mu] - q_l[mu]
    dmv = q_r[mv] - q_l[mv]

    a1 = 0.5 * ((u + c) * d0 - dmu) / c
    a2 = dmv - v * d0                      # shear strength
    a3 = 0.5 * (-(u - c) * d0 + dmu) / c

    num_eqn = q_l.shape[0]
    z = jnp.zeros(d0.shape, q_l.dtype)

    def mk(h_c, mu_c, mv_c):
        comp = [z] * num_eqn
        comp[0] = h_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        return jnp.stack(comp)

    w1 = mk(a1, a1 * (u - c), a1 * v)
    w2 = mk(z, z, a2)
    w3 = mk(a3, a3 * (u + c), a3 * v)
    wave = jnp.stack([w1, w2, w3], axis=1)
    s = jnp.stack([u - c, u, u + c])

    # entropy fix on waves 1 and 3
    c_l = jnp.sqrt(g * h_l)
    c_r = jnp.sqrt(g * h_r)
    hm = h_l + a1
    hum = q_l[mu] + a1 * (u - c)
    um = hum / jnp.where(hm <= 0.0, 1.0, hm)
    cm = jnp.sqrt(g * jnp.maximum(hm, 0.0))

    lam1_l = u_l - c_l
    lam1_m = um - cm
    trans1 = (lam1_l < 0.0) & (lam1_m > 0.0)
    den1 = jnp.where(lam1_m - lam1_l == 0.0, 1.0, lam1_m - lam1_l)
    sf1 = jnp.where(trans1, lam1_l * (lam1_m - s[0]) / den1,
                    jnp.minimum(s[0], 0.0))

    sf2 = jnp.minimum(s[1], 0.0)

    hm3 = h_r - a3
    hum3 = q_r[mu] - a3 * (u + c)
    um3 = hum3 / jnp.where(hm3 <= 0.0, 1.0, hm3)
    cm3 = jnp.sqrt(g * jnp.maximum(hm3, 0.0))
    lam3_m = um3 + cm3
    lam3_r = u_r + c_r
    trans3 = (lam3_m < 0.0) & (lam3_r > 0.0)
    den3 = jnp.where(lam3_r - lam3_m == 0.0, 1.0, lam3_r - lam3_m)
    sf3 = jnp.where(trans3, lam3_m * (lam3_r - s[2]) / den3,
                    jnp.minimum(s[2], 0.0))

    amdq = sf1 * w1 + sf2 * w2 + sf3 * w3
    df = s[0] * w1 + s[1] * w2 + s[2] * w3
    apdq = df - amdq
    return wave, s, amdq, apdq


def _rpt2_shallow_roe(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params):
    """Transverse split (rpt2_shallow_roe_with_efix.f90): eigen-decompose
    asdq in the transverse direction at the Roe average."""
    g = params["grav"]
    mu = 1 + ixy
    mv = 2 - ixy
    h_l, h_r = q_l[0], q_r[0]
    u_l, u_r = q_l[mu] / h_l, q_r[mu] / h_r
    v_l, v_r = q_l[mv] / h_l, q_r[mv] / h_r
    sh_l, sh_r = jnp.sqrt(h_l), jnp.sqrt(h_r)
    wgt = 1.0 / (sh_l + sh_r)
    u = (sh_l * u_l + sh_r * u_r) * wgt
    v = (sh_l * v_l + sh_r * v_r) * wgt
    c = jnp.sqrt(g * 0.5 * (h_l + h_r))

    d0, dmu, dmv = asdq[0], asdq[mu], asdq[mv]
    b1 = 0.5 * ((v + c) * d0 - dmv) / c
    b2 = dmu - u * d0
    b3 = 0.5 * (-(v - c) * d0 + dmv) / c

    num_eqn = q_l.shape[0]
    z = jnp.zeros(d0.shape, asdq.dtype)

    def mk(h_c, mu_c, mv_c):
        comp = [z] * num_eqn
        comp[0] = h_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        return jnp.stack(comp)

    w1 = mk(b1, b1 * u, b1 * (v - c))
    w2 = mk(z, b2, z)
    w3 = mk(b3, b3 * u, b3 * (v + c))
    speeds = [v - c, v, v + c]

    bmasdq = jnp.zeros_like(asdq)
    bpasdq = jnp.zeros_like(asdq)
    for w, sp in zip((w1, w2, w3), speeds):
        bmasdq = bmasdq + jnp.minimum(sp, 0.0) * w
        bpasdq = bpasdq + jnp.maximum(sp, 0.0) * w
    return bmasdq, bpasdq


def _evec_shallow(ixy, q, aux, params):
    """Eigenvector matrices of the shallow-water Jacobian at each cell
    state (sharpclaw evec hook for char_decomp).  1D: (h, hu); 2D:
    (h, hu, hv) with the transverse momentum riding the u-eigenvalue
    contact."""
    g = params["grav"]
    h = q[0]
    c = jnp.sqrt(g * h)
    num_eqn = q.shape[0]
    if num_eqn == 2:
        u = q[1] / h
        one = jnp.ones_like(u)
        R = jnp.stack([jnp.stack([one, one]),
                       jnp.stack([u - c, u + c])])
        inv2c = 0.5 / c
        L = jnp.stack([jnp.stack([(u + c) * inv2c, -one * inv2c]),
                       jnp.stack([-(u - c) * inv2c, one * inv2c])])
        return R, L
    mu = 1 + ixy
    mv = 2 - ixy
    un = q[mu] / h
    ut = q[mv] / h
    one = jnp.ones_like(un)
    inv2c = 0.5 / c
    shape = (3, 3) + un.shape
    R = jnp.zeros(shape, dtype=q.dtype)
    R = R.at[0, 0].set(one).at[mu, 0].set(un - c).at[mv, 0].set(ut)
    R = R.at[mv, 1].set(one)
    R = R.at[0, 2].set(one).at[mu, 2].set(un + c).at[mv, 2].set(ut)
    L = jnp.zeros(shape, dtype=q.dtype)
    L = L.at[0, 0].set((un + c) * inv2c).at[0, mu].set(-inv2c)
    L = L.at[1, 0].set(-ut).at[1, mv].set(one)
    L = L.at[2, 0].set(-(un - c) * inv2c).at[2, mu].set(inv2c)
    return R, L


def _flux_shallow(ixy, q, aux, params):
    """Shallow-water flux along ixy: [hu, hu^2 + g h^2/2, huv]
    (RiemannSolver.flux protocol; flat-bottom solvers only — the
    bathymetry f-wave solvers fold the topography source into their
    fluctuations and keep the Riemann-based total fluctuation)."""
    g = params["grav"]
    h = q[0]
    mu = 1 + ixy
    wet = h > 0.0
    u = jnp.where(wet, q[mu] / jnp.where(wet, h, 1.0), 0.0)
    f = u[None] * q                    # [hu, hu*u, hv*u]
    f = f.at[mu].add(0.5 * g * h * h)
    return f


from . import RiemannSolver  # noqa: E402

shallow_roe_with_efix_1D = RiemannSolver("shallow_roe_with_efix_1D", 1, 2, 2,
                                         _rp1_shallow_with_efix,
                                         requires=("grav",))
shallow_roe_with_efix_1D.evec = _evec_shallow
shallow_hlle_1D = RiemannSolver("shallow_hlle_1D", 1, 2, 2,
                                _rp1_shallow_hlle, requires=("grav",))
shallow_hlle_1D.evec = _evec_shallow
shallow_roe_with_efix_2D = RiemannSolver("shallow_roe_with_efix_2D", 2, 3, 3,
                                         _rpn2_shallow_roe,
                                         rpt=_rpt2_shallow_roe,
                                         requires=("grav",))
shallow_roe_with_efix_2D.evec = _evec_shallow
for _s in (shallow_roe_with_efix_1D, shallow_hlle_1D,
           shallow_roe_with_efix_2D):
    _s.flux = _flux_shallow


def _rp1_shallow_bathymetry_fwave(ixy, q_l, q_r, aux_l, aux_r, params):
    """Well-balanced f-wave solver for shallow water over bathymetry
    (reference riemann shallow_bathymetry_fwave_1D / GeoClaw-style sw_aug;
    SURVEY.md §2.8): aux[0] = b(x).  The flux jump is augmented with the
    topography source g h_bar (b_r - b_l) and decomposed into f-waves at
    the Roe speeds, so the lake-at-rest state (h + b = const, u = 0) has
    ZERO fluctuations — exact discrete balance.  Use with
    solver.fwave = True."""
    g = params["grav"]
    h_l, h_r = q_l[0], q_r[0]
    hu_l, hu_r = q_l[1], q_r[1]
    u_l, u_r = hu_l / h_l, hu_r / h_r
    b_l, b_r = aux_l[0], aux_r[0]

    sh_l, sh_r = jnp.sqrt(h_l), jnp.sqrt(h_r)
    u = (sh_l * u_l + sh_r * u_r) / (sh_l + sh_r)
    c = jnp.sqrt(g * 0.5 * (h_l + h_r))
    s1 = jnp.minimum(u - c, u_l - jnp.sqrt(g * h_l))
    s2 = jnp.maximum(u + c, u_r + jnp.sqrt(g * h_r))

    hbar = 0.5 * (h_l + h_r)
    fd1 = hu_r - hu_l
    fd2 = (hu_r * u_r + 0.5 * g * h_r * h_r) \
        - (hu_l * u_l + 0.5 * g * h_l * h_l) \
        + g * hbar * (b_r - b_l)

    denom = jnp.where(s2 - s1 == 0.0, 1.0, s2 - s1)
    beta1 = (s2 * fd1 - fd2) / denom
    beta2 = (fd2 - s1 * fd1) / denom

    w1 = jnp.stack([beta1, beta1 * s1])
    w2 = jnp.stack([beta2, beta2 * s2])
    wave = jnp.stack([w1, w2], axis=1)
    s = jnp.stack([s1, s2])
    amdq = jnp.where(s1 < 0.0, w1, jnp.zeros_like(w1)) \
        + jnp.where(s2 < 0.0, w2, jnp.zeros_like(w2))
    apdq = jnp.where(s1 >= 0.0, w1, jnp.zeros_like(w1)) \
        + jnp.where(s2 >= 0.0, w2, jnp.zeros_like(w2))
    return wave, s, amdq, apdq


def _rpn2_shallow_bathymetry_fwave(ixy, q_l, q_r, aux_l, aux_r, params):
    """2D well-balanced f-wave solver over bathymetry (reference
    rpn2_shallow_bathymetry_fwave.f90, the sw_aug_2D-class GeoClaw-style
    solver; SURVEY.md §2.8): aux[0] = b(x,y).  Three f-waves — two
    gravity waves at HLLE-bounded Roe speeds carrying the augmented
    normal flux jump (incl. the g h_bar Δb topography term, so
    lake-at-rest is exactly balanced) and a passive transverse-momentum
    wave at the Roe normal speed.  Dry-safe divisions via a tolerance.
    Use with solver.fwave = True."""
    g = params["grav"]
    dry = params.get("dry_tolerance", 1e-8)
    mu = 1 + ixy
    mv = 2 - ixy

    h_l, h_r = q_l[0], q_r[0]
    wet_l, wet_r = h_l > dry, h_r > dry
    hs_l = jnp.where(wet_l, h_l, 1.0)
    hs_r = jnp.where(wet_r, h_r, 1.0)
    u_l = jnp.where(wet_l, q_l[mu] / hs_l, 0.0)
    u_r = jnp.where(wet_r, q_r[mu] / hs_r, 0.0)
    v_l = jnp.where(wet_l, q_l[mv] / hs_l, 0.0)
    v_r = jnp.where(wet_r, q_r[mv] / hs_r, 0.0)
    b_l, b_r = aux_l[0], aux_r[0]

    sh_l, sh_r = jnp.sqrt(jnp.maximum(h_l, 0.0)), \
        jnp.sqrt(jnp.maximum(h_r, 0.0))
    denom_roe = jnp.where(sh_l + sh_r > 0.0, sh_l + sh_r, 1.0)
    u = (sh_l * u_l + sh_r * u_r) / denom_roe
    c = jnp.sqrt(g * 0.5 * (h_l + h_r))
    s1 = jnp.minimum(u - c, u_l - jnp.sqrt(g * jnp.maximum(h_l, 0.0)))
    s3 = jnp.maximum(u + c, u_r + jnp.sqrt(g * jnp.maximum(h_r, 0.0)))
    s2 = u

    hbar = 0.5 * (h_l + h_r)
    fd1 = q_r[mu] - q_l[mu]
    fd2 = (q_r[mu] * u_r + 0.5 * g * h_r * h_r) \
        - (q_l[mu] * u_l + 0.5 * g * h_l * h_l) \
        + g * hbar * (b_r - b_l)
    fd3 = q_r[mu] * v_r - q_l[mu] * v_l

    denom = jnp.where(s3 - s1 == 0.0, 1.0, s3 - s1)
    beta1 = (s3 * fd1 - fd2) / denom
    beta3 = (fd2 - s1 * fd1) / denom

    num_eqn = q_l.shape[0]

    def mk(h_c, mu_c, mv_c):
        comp = [None] * num_eqn
        comp[0], comp[mu], comp[mv] = h_c, mu_c, mv_c
        return jnp.stack(comp)

    z = jnp.zeros_like(h_l)
    w1 = mk(beta1, beta1 * s1, beta1 * v_l)
    w3 = mk(beta3, beta3 * s3, beta3 * v_r)
    w2 = mk(z, z, fd3 - beta1 * v_l - beta3 * v_r)
    wave = jnp.stack([w1, w2, w3], axis=1)
    s = jnp.stack([s1, s2, s3])

    amdq = jnp.zeros_like(q_l)
    apdq = jnp.zeros_like(q_l)
    for w, sp in ((w1, s1), (w2, s2), (w3, s3)):
        amdq = amdq + jnp.where(sp < 0.0, w, 0.0)
        apdq = apdq + jnp.where(sp >= 0.0, w, 0.0)
    return wave, s, amdq, apdq


def _shallow_positivity(q, aux, params):
    return q[0] > 0.0


shallow_roe_with_efix_1D.positivity = _shallow_positivity
shallow_hlle_1D.positivity = _shallow_positivity
shallow_roe_with_efix_2D.positivity = _shallow_positivity

shallow_bathymetry_fwave_1D = RiemannSolver(
    "shallow_bathymetry_fwave_1D", 1, 2, 2, _rp1_shallow_bathymetry_fwave,
    requires=("grav",))
shallow_bathymetry_fwave_1D.positivity = _shallow_positivity

shallow_bathymetry_fwave_2D = RiemannSolver(
    "shallow_bathymetry_fwave_2D", 2, 3, 3,
    _rpn2_shallow_bathymetry_fwave, rpt=_rpt2_shallow_roe,
    requires=("grav",))
shallow_bathymetry_fwave_2D.positivity = _shallow_positivity


# ----------------------------------------------------------------------
# GeoClaw-class augmented solver with wetting/drying (sw_aug)
# ----------------------------------------------------------------------
def _sw_aug_core(g, dry, h_l, h_r, hu_l, hu_r, b_l, b_r):
    """Shared dry-state machinery of the augmented solver (reference
    riemann/src/rpn2_sw_aug.f90, George 2008; SURVEY.md §2.8 long tail):

      - WALL treatment: a dry cell whose bottom sits above the wet
        neighbour's surface reflects the wet state (zero-through-flow;
        also what makes a lake at rest against a dry island exactly
        steady),
      - dry-front wave speeds: Einfeldt bounds, replaced by the exact
        rarefaction front speed u +/- 2c toward a dry side (the Ritter
        front), which also makes the HLLE-form split depth-positive
        under CFL,
      - HLLE-type decomposition of the bathymetry-AUGMENTED jumps: the
        flux jump carries the g h_bar Delta b source and the dissipative
        state jump uses the SURFACE eta = h + b instead of the depth, so
        lake-at-rest has zero waves (exact balance) while an
        entropy-violating equal-flux jump (Delta f = 0, Delta eta != 0)
        still receives s1*s2*Delta-eta dissipation and diffuses away —
        the pure f-wave form is stationary there (it is a steady state
        of any scheme that only sees flux differences).

    Returns (s1, s2, W1, W2, u_hat, wall_l, wall_r) with W_p the
    (h, hu_normal) q-wave components; fluctuation split is
    amdq = s1^- W1 + s2^- W2 (and + mirror), conservative because
    s1 W1 + s2 W2 = Delta f_aug identically.
    """
    wet_l, wet_r = h_l > dry, h_r > dry
    u_l0 = jnp.where(wet_l, hu_l / jnp.where(wet_l, h_l, 1.0), 0.0)
    u_r0 = jnp.where(wet_r, hu_r / jnp.where(wet_r, h_r, 1.0), 0.0)

    wall_r = (~wet_r) & wet_l & (h_l + b_l <= b_r)
    wall_l = (~wet_l) & wet_r & (h_r + b_r <= b_l)

    h_le = jnp.where(wall_l, h_r, jnp.where(wet_l, h_l, 0.0))
    u_le = jnp.where(wall_l, -u_r0, u_l0)
    b_le = jnp.where(wall_l, b_r, b_l)
    h_re = jnp.where(wall_r, h_l, jnp.where(wet_r, h_r, 0.0))
    u_re = jnp.where(wall_r, -u_l0, u_r0)
    b_re = jnp.where(wall_r, b_l, b_r)
    wet_le = wet_l | wall_l
    wet_re = wet_r | wall_r
    bothdry = (~wet_le) & (~wet_re)

    c_l = jnp.sqrt(g * h_le)
    c_r = jnp.sqrt(g * h_re)
    sh_l, sh_r = jnp.sqrt(h_le), jnp.sqrt(h_re)
    wsum = jnp.where(sh_l + sh_r > 0.0, sh_l + sh_r, 1.0)
    u_hat = (sh_l * u_le + sh_r * u_re) / wsum
    c_hat = jnp.sqrt(g * 0.5 * (h_le + h_re))

    s1 = jnp.minimum(u_le - c_l, u_hat - c_hat)
    s2 = jnp.maximum(u_re + c_r, u_hat + c_hat)
    # exact rarefaction front toward a dry side (Ritter)
    s1 = jnp.where(wet_re & ~wet_le, u_re - 2.0 * c_r, s1)
    s2 = jnp.where(wet_le & ~wet_re, u_le + 2.0 * c_l, s2)
    s1 = jnp.where(bothdry, 0.0, s1)
    s2 = jnp.where(bothdry, 0.0, s2)

    hu_le = h_le * u_le
    hu_re = h_re * u_re
    hbar = 0.5 * (h_le + h_re)
    fd1 = hu_re - hu_le
    fd2 = (hu_re * u_re + 0.5 * g * h_re * h_re) \
        - (hu_le * u_le + 0.5 * g * h_le * h_le) \
        + g * hbar * (b_re - b_le)
    # dissipative state jump: surface eta and momentum
    dq1 = (h_re + b_re) - (h_le + b_le)
    dq2 = fd1

    denom = jnp.where(s2 - s1 == 0.0, 1.0, s2 - s1)
    zero = jnp.where(bothdry, 0.0, 1.0 / denom)
    W1 = ((s2 * dq1 - fd1) * zero, (s2 * dq2 - fd2) * zero)
    W2 = ((fd1 - s1 * dq1) * zero, (fd2 - s1 * dq2) * zero)
    u_hat = jnp.where(bothdry, 0.0, u_hat)
    return s1, s2, W1, W2, u_hat, wall_l, wall_r


def _rp1_sw_aug(ixy, q_l, q_r, aux_l, aux_r, params):
    """1D augmented shallow-water solver with wetting/drying (reference
    GeoClaw rp1-class sw_aug).  aux[0] = b(x); use solver.fwave = True.
    problem_data['dry_tolerance'] (default 1e-8) marks dry cells."""
    g = params["grav"]
    dry = params.get("dry_tolerance", 1e-8)
    s1, s2, W1, W2, _, wall_l, wall_r = _sw_aug_core(
        g, dry, q_l[0], q_r[0], q_l[1], q_r[1], aux_l[0], aux_r[0])

    # f-waves Z_p = s_p W_p (kernels' fwave limiter/correction contract);
    # zeroed at wet/dry interfaces so the 2nd-order correction fluxes
    # drop to first order at fronts (GeoClaw does the same) — the
    # limited corrections are not positivity-preserving over dry cells
    frontal = (q_l[0] <= dry) | (q_r[0] <= dry)
    z1 = jnp.where(frontal, 0.0, jnp.stack([s1 * W1[0], s1 * W1[1]]))
    z2 = jnp.where(frontal, 0.0, jnp.stack([s2 * W2[0], s2 * W2[1]]))
    wave = jnp.stack([z1, z2], axis=1)
    s = jnp.stack([s1, s2])
    amdq = jnp.minimum(s1, 0.0) * jnp.stack(W1) \
        + jnp.minimum(s2, 0.0) * jnp.stack(W2)
    apdq = jnp.maximum(s1, 0.0) * jnp.stack(W1) \
        + jnp.maximum(s2, 0.0) * jnp.stack(W2)
    # no flow into a dry wall cell
    amdq = jnp.where(wall_l, 0.0, amdq)
    apdq = jnp.where(wall_r, 0.0, apdq)
    return wave, s, amdq, apdq


def _rpn2_sw_aug(ixy, q_l, q_r, aux_l, aux_r, params):
    """2D augmented shallow-water solver with wetting/drying (reference
    riemann/src/rpn2_sw_aug.f90): the 1D augmented machinery in the
    normal direction plus a passive transverse-momentum shear wave.
    aux[0] = b(x, y); use solver.fwave = True."""
    g = params["grav"]
    dry = params.get("dry_tolerance", 1e-8)
    mu = 1 + ixy
    mv = 2 - ixy

    h_l, h_r = q_l[0], q_r[0]
    wet_l, wet_r = h_l > dry, h_r > dry
    v_l = jnp.where(wet_l, q_l[mv] / jnp.where(wet_l, h_l, 1.0), 0.0)
    v_r = jnp.where(wet_r, q_r[mv] / jnp.where(wet_r, h_r, 1.0), 0.0)

    s1, s3, W1, W3, u_hat, wall_l, wall_r = _sw_aug_core(
        g, dry, h_l, h_r, q_l[mu], q_r[mu], aux_l[0], aux_r[0])
    s2 = u_hat                       # shear rides the normal flow

    # shear: transverse momentum advects with the normal flow
    hu_le = jnp.where(wet_l | wall_l,
                      jnp.where(wall_l, -q_r[mu], q_l[mu]), 0.0)
    hu_re = jnp.where(wet_r | wall_r,
                      jnp.where(wall_r, -q_l[mu], q_r[mu]), 0.0)
    fd3 = hu_re * v_r - hu_le * v_l

    num_eqn = q_l.shape[0]

    def mk(h_c, mu_c, mv_c):
        comp = [None] * num_eqn
        comp[0], comp[mu], comp[mv] = h_c, mu_c, mv_c
        return jnp.stack(comp)

    z = jnp.zeros_like(h_l)
    zv1 = mk(s1 * W1[0], s1 * W1[1], s1 * W1[0] * v_l)
    zv3 = mk(s3 * W3[0], s3 * W3[1], s3 * W3[0] * v_r)
    zv2 = mk(z, z, fd3 - s1 * W1[0] * v_l - s3 * W3[0] * v_r)
    # first-order at wet/dry fronts (see the 1D solver's note)
    frontal = (~wet_l) | (~wet_r)
    wave = jnp.where(frontal, 0.0, jnp.stack([zv1, zv2, zv3], axis=1))
    s = jnp.stack([s1, s2, s3])

    wv1 = mk(W1[0], W1[1], W1[0] * v_l)
    wv3 = mk(W3[0], W3[1], W3[0] * v_r)
    amdq = jnp.minimum(s1, 0.0) * wv1 + jnp.minimum(s3, 0.0) * wv3 \
        + jnp.where(s2 < 0.0, zv2, 0.0)
    apdq = jnp.maximum(s1, 0.0) * wv1 + jnp.maximum(s3, 0.0) * wv3 \
        + jnp.where(s2 >= 0.0, zv2, 0.0)
    amdq = jnp.where(wall_l, 0.0, amdq)
    apdq = jnp.where(wall_r, 0.0, apdq)
    return wave, s, amdq, apdq


def _rpt2_sw_aug(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params):
    """Transverse split for the augmented solver: the Roe transverse
    split of the wet-wet case, suppressed wherever either side is dry
    (GeoClaw guards its transverse solver the same way — transverse
    corrections are an accuracy term, never a stability requirement)."""
    g = params["grav"]
    dry = params.get("dry_tolerance", 1e-8)
    wet = (q_l[0] > dry) & (q_r[0] > dry)
    ql_s = jnp.where(wet[None], q_l, jnp.ones_like(q_l))
    qr_s = jnp.where(wet[None], q_r, jnp.ones_like(q_r))
    bmasdq, bpasdq = _rpt2_shallow_roe(ixy, imp, ql_s, qr_s, aux_l,
                                       aux_r, asdq, params)
    return (jnp.where(wet[None], bmasdq, 0.0),
            jnp.where(wet[None], bpasdq, 0.0))


def _sw_aug_positivity(q, aux, params):
    dry = params.get("dry_tolerance", 1e-8)
    return q[0] > dry


sw_aug_1D = RiemannSolver("sw_aug_1D", 1, 2, 2, _rp1_sw_aug,
                          requires=("grav",))
sw_aug_1D.positivity = _sw_aug_positivity
sw_aug_2D = RiemannSolver("sw_aug_2D", 2, 3, 3, _rpn2_sw_aug,
                          rpt=_rpt2_sw_aug, requires=("grav",))
sw_aug_2D.positivity = _sw_aug_positivity
