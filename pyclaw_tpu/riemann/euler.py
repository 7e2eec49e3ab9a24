"""Euler-equation Riemann solvers.

Physics parity with reference ``riemann/src/rp1_euler_with_efix.f90``
(:~1-140, Roe + Harten entropy fix), ``rpn2_euler_4wave.f90`` /
``rpn2_euler_5wave.f90`` / ``rpt2_euler.f90`` (:~1-120/130), and
``rpn3_euler.f90`` + ``rpt3_euler.f90`` + ``rptt3_euler.f90`` (SURVEY.md
§2.8), cross-checked against the vectorized Python spec
``riemann/riemann/euler_1D_py.py``.  Ideal gas, gamma from problem_data.

All branches (entropy fix transonic tests, HLLE wave-speed selection) are
rewritten as jnp.where so the solvers are branch-free on the VPU.

q layouts:  1D (rho, rho*u, E);  2D (rho, rho*u, rho*v, E);
            3D (rho, rho*u, rho*v, rho*w, E);  5wave adds a tracer row.
"""

from __future__ import annotations

import jax.numpy as jnp


def _wsum(coef, wave):
    """sum_p coef[p] * wave[:, p]  ->  (num_eqn, *n).

    Elementwise multiply + small-axis reduce; fuses on the VPU.  (The old
    einsum form lowered to a dot_general — a 4x4 batched matvec per grid
    point that XLA tiles for the MXU, measured ~an order of magnitude
    slower than this fused reduction on the 2D Euler hot path.)"""
    return jnp.sum(coef[None] * wave, axis=1)


def _roe_averages(q_l, q_r, gamma, vel_idx, e_idx=None):
    """Roe-averaged velocities (one per entry of vel_idx), enthalpy, sound
    speed.  Returns (vels, H, a, a2, (p_l, p_r)).

    Divide-diet form (r4): q/rho*sqrt(rho) == q*rsqrt(rho), so the two
    sqrts become rsqrts and every per-side division becomes a multiply
    by rsqrt(rho) or 1/rho = rsqrt(rho)^2 — 7 divides + 2 sqrts drop to
    1 divide + 2 rsqrts per interface.  Divides cost ~6 FMA slots on
    this VPU (tools/roofline.py) and the Roe average runs at every
    interface of every sweep, so this is a measurable slice of the
    op-weighted floor.  Values agree with the division form to roundoff
    (golden suite unchanged at its tolerances)."""
    from jax import lax

    rho_l, rho_r = q_l[0], q_r[0]
    irl, irr = lax.rsqrt(rho_l), lax.rsqrt(rho_r)
    srl, srr = rho_l * irl, rho_r * irr
    rinv_l, rinv_r = irl * irl, irr * irr
    w = 1.0 / (srl + srr)
    vels = [(q_l[i] * irl + q_r[i] * irr) * w for i in vel_idx]
    E_idx = (1 + len(vel_idx)) if e_idx is None else e_idx
    ke_l = 0.5 * sum(q_l[i] ** 2 for i in vel_idx) * rinv_l
    ke_r = 0.5 * sum(q_r[i] ** 2 for i in vel_idx) * rinv_r
    p_l = (gamma - 1.0) * (q_l[E_idx] - ke_l)
    p_r = (gamma - 1.0) * (q_r[E_idx] - ke_r)
    H_l = (q_l[E_idx] + p_l) * rinv_l
    H_r = (q_r[E_idx] + p_r) * rinv_r
    H = (srl * H_l + srr * H_r) * w
    ke = 0.5 * sum(v * v for v in vels)
    a2 = (gamma - 1.0) * (H - ke)
    a = jnp.sqrt(a2)
    return vels, H, a, a2, (p_l, p_r)


def _alpha34(g1, a, a2, u, n3, n4_partial):
    """Acoustic/entropy wave strengths of the 2D Roe decomposition:
    a3 = g1/a2 * n3,  a4 = (n4_partial - a*a3) / (2a).

    float64 (correctness regime): the literal divisions — bitwise the
    reference rpn2_euler algebra, golden-suite pinned.

    float32 (TPU perf regime, round-5 divide diet): 1/a2 and 1/(2a) are
    both powers of rsqrt(a2) (ia = rsqrt(a2) = 1/a; 1/a2 = ia*ia), so
    the two divides become one rsqrt + multiplies (divides cost ~6 FMA
    slots, rsqrt ~4 — tools/roofline.py).  Used by both the generic AoS
    and the SoA 2D solvers so the dual-path equality oracle holds at
    either dtype."""
    if jnp.result_type(a2) == jnp.float64:
        a3 = g1 / a2 * n3
        a4 = (n4_partial - a * a3) / (2.0 * a)
        return a3, a4
    from jax import lax
    ia = lax.rsqrt(a2)
    a3 = g1 * (ia * ia) * n3
    a4 = (n4_partial - a * a3) * (0.5 * ia)
    return a3, a4


# ======================================================================
# 1D Roe solver with Harten entropy fix (rp1_euler_with_efix.f90)
# ======================================================================
def _rp1_euler_roe(ixy, q_l, q_r, aux_l, aux_r, params, efix=True):
    gamma = params["gamma"]
    g1 = gamma - 1.0
    (u,), H, a, a2, _ = _roe_averages(q_l, q_r, gamma, (1,))

    d = q_r - q_l
    a2_coef = g1 / a2 * ((H - u * u) * d[0] + u * d[1] - d[2])
    a3_coef = (d[1] + (a - u) * d[0] - a * a2_coef) / (2.0 * a)
    a1_coef = d[0] - a2_coef - a3_coef

    w1 = jnp.stack([a1_coef, a1_coef * (u - a), a1_coef * (H - u * a)])
    w2 = jnp.stack([a2_coef, a2_coef * u, a2_coef * 0.5 * u * u])
    w3 = jnp.stack([a3_coef, a3_coef * (u + a), a3_coef * (H + u * a)])
    wave = jnp.stack([w1, w2, w3], axis=1)
    s = jnp.stack([u - a, u, u + a])

    if not efix:
        sneg = jnp.minimum(s, 0.0)
        spos = jnp.maximum(s, 0.0)
        amdq = _wsum(sneg, wave)
        apdq = _wsum(spos, wave)
        return wave, s, amdq, apdq

    # Harten entropy fix: transonic 1- and 3-rarefactions get a split speed.
    def sound(state):
        rho, mom, E = state
        p = g1 * (E - 0.5 * mom * mom / rho)
        return mom / rho, jnp.sqrt(jnp.maximum(gamma * p / rho, 1e-300))

    u_l, c_l = sound((q_l[0], q_l[1], q_l[2]))
    u_r, c_r = sound((q_r[0], q_r[1], q_r[2]))

    # state just right of the 1-wave
    qm1 = q_l + w1
    u_m1, c_m1 = sound((qm1[0], qm1[1], qm1[2]))
    lam1_l = u_l - c_l
    lam1_m = u_m1 - c_m1
    trans1 = (lam1_l < 0.0) & (lam1_m > 0.0)
    sfract1 = jnp.where(
        trans1,
        lam1_l * (lam1_m - s[0]) / jnp.where(lam1_m - lam1_l == 0.0, 1.0,
                                             lam1_m - lam1_l),
        jnp.minimum(s[0], 0.0))

    sfract2 = jnp.minimum(s[1], 0.0)

    # state just left of the 3-wave
    qm3 = q_r - w3
    u_m3, c_m3 = sound((qm3[0], qm3[1], qm3[2]))
    lam3_m = u_m3 + c_m3
    lam3_r = u_r + c_r
    trans3 = (lam3_m < 0.0) & (lam3_r > 0.0)
    sfract3 = jnp.where(
        trans3,
        lam3_m * (lam3_r - s[2]) / jnp.where(lam3_r - lam3_m == 0.0, 1.0,
                                             lam3_r - lam3_m),
        jnp.minimum(s[2], 0.0))

    amdq = sfract1 * w1 + sfract2 * w2 + sfract3 * w3
    # conservation: amdq + apdq = f(q_r) - f(q_l) = sum_p s_p W_p (Roe)
    df = _wsum(s, wave)
    apdq = df - amdq
    return wave, s, amdq, apdq


def _rp1_euler_with_efix(ixy, q_l, q_r, aux_l, aux_r, params):
    return _rp1_euler_roe(ixy, q_l, q_r, aux_l, aux_r, params, efix=True)


def _rp1_euler_roe_nofix(ixy, q_l, q_r, aux_l, aux_r, params):
    return _rp1_euler_roe(ixy, q_l, q_r, aux_l, aux_r, params, efix=False)


# ======================================================================
# 1D HLLE (euler_1D_py.py — euler_hll_1D spec)
# ======================================================================
def _rp1_euler_hlle(ixy, q_l, q_r, aux_l, aux_r, params):
    gamma = params["gamma"]
    g1 = gamma - 1.0
    (u,), H, a, a2, _ = _roe_averages(q_l, q_r, gamma, (1,))
    u_l = q_l[1] / q_l[0]
    u_r = q_r[1] / q_r[0]
    p_l = g1 * (q_l[2] - 0.5 * q_l[1] ** 2 / q_l[0])
    p_r = g1 * (q_r[2] - 0.5 * q_r[1] ** 2 / q_r[0])
    c_l = jnp.sqrt(gamma * p_l / q_l[0])
    c_r = jnp.sqrt(gamma * p_r / q_r[0])

    s1 = jnp.minimum(u - a, u_l - c_l)
    s2 = jnp.maximum(u + a, u_r + c_r)

    f_l = jnp.stack([q_l[1], q_l[1] * u_l + p_l, u_l * (q_l[2] + p_l)])
    f_r = jnp.stack([q_r[1], q_r[1] * u_r + p_r, u_r * (q_r[2] + p_r)])
    denom = jnp.where(s2 - s1 == 0.0, 1.0, s2 - s1)
    q_m = (f_r - f_l - (s2 * q_r - s1 * q_l)) / -denom

    wave = jnp.stack([q_m - q_l, q_r - q_m], axis=1)
    s = jnp.stack([s1, s2])
    sneg = jnp.minimum(s, 0.0)
    spos = jnp.maximum(s, 0.0)
    amdq = _wsum(sneg, wave)
    apdq = _wsum(spos, wave)
    return wave, s, amdq, apdq


# ======================================================================
# 2D 4-wave Roe solver (rpn2_euler_4wave.f90)
# ======================================================================
def _rpn2_euler(ixy, q_l, q_r, aux_l, aux_r, params, tracer=False):
    gamma = params["gamma"]
    g1 = gamma - 1.0
    mu = 1 + ixy          # normal momentum component
    mv = 2 - ixy          # transverse momentum component
    E = 3

    (u, v), H, a, a2, _ = _roe_averages(q_l, q_r, gamma, (mu, mv))

    d = q_r - q_l
    d0, dmu, dmv, dE = d[0], d[mu], d[mv], d[E]

    euv = H - (u * u + v * v)
    a3, a4 = _alpha34(g1, a, a2, u,
                      euv * d0 + u * dmu + v * dmv - dE,
                      dmu + (a - u) * d0)
    a2w = dmv - v * d0                 # shear strength
    a1 = d0 - a3 - a4

    num_eqn = q_l.shape[0]
    sp = d.shape[1:]
    z = jnp.zeros(sp, d.dtype)

    def mk(rho_c, mu_c, mv_c, e_c):
        comp = [z] * num_eqn
        comp[0] = rho_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        comp[E] = e_c
        return jnp.stack(comp)

    w1 = mk(a1, a1 * (u - a), a1 * v, a1 * (H - u * a))
    w2 = mk(a3, a3 * u, a3 * v, a3 * 0.5 * (u * u + v * v))
    w3 = mk(z, z, a2w, a2w * v)
    w4 = mk(a4, a4 * (u + a), a4 * v, a4 * (H + u * a))
    waves = [w1, w2, w3, w4]
    speeds = [u - a, u, u, u + a]

    if tracer:
        # 5th equation: passive tracer q4 = rho*phi (rpn2_euler_5wave.f90).
        # Roe extension: every wave that carries density also carries
        # phi_hat * (density strength); the remaining concentration jump
        # rides its own u-speed wave — this keeps amdq+apdq == the exact
        # tracer flux difference (verified in test_riemann).
        T = 4
        srl, srr = jnp.sqrt(q_l[0]), jnp.sqrt(q_r[0])
        phat = (srl * (q_l[T] / q_l[0]) + srr * (q_r[T] / q_r[0])) \
            / (srl + srr)
        waves[0] = waves[0].at[T].set(a1 * phat)
        waves[1] = waves[1].at[T].set(a3 * phat)
        waves[3] = waves[3].at[T].set(a4 * phat)
        a5 = d[T] - phat * d0
        wt = jnp.zeros((num_eqn,) + sp, d.dtype).at[T].set(a5)
        waves.append(wt)
        speeds.append(u)

    wave = jnp.stack(waves, axis=1)
    s = jnp.stack(speeds)
    sneg = jnp.minimum(s, 0.0)
    spos = jnp.maximum(s, 0.0)
    amdq = _wsum(sneg, wave)
    apdq = _wsum(spos, wave)
    return wave, s, amdq, apdq


def _rpn2_euler_4wave(ixy, q_l, q_r, aux_l, aux_r, params):
    return _rpn2_euler(ixy, q_l, q_r, aux_l, aux_r, params, tracer=False)


def _rpn2_euler_5wave(ixy, q_l, q_r, aux_l, aux_r, params):
    return _rpn2_euler(ixy, q_l, q_r, aux_l, aux_r, params, tracer=True)


# ---- SoA fast-path variants (classic/soa.py protocol) ----------------
def _roe_averages_soa(q_l, q_r, gamma, mu, mv):
    """2D-array Roe averages, same divide-diet algebra as
    _roe_averages (rsqrt form) so the SoA path reproduces the generic
    kernels to roundoff."""
    from jax import lax

    rho_l, rho_r = q_l[0], q_r[0]
    irl, irr = lax.rsqrt(rho_l), lax.rsqrt(rho_r)
    srl, srr = rho_l * irl, rho_r * irr
    rinv_l, rinv_r = irl * irl, irr * irr
    w = 1.0 / (srl + srr)
    u = (q_l[mu] * irl + q_r[mu] * irr) * w
    v = (q_l[mv] * irl + q_r[mv] * irr) * w
    ke_l = 0.5 * (q_l[mu] ** 2 + q_l[mv] ** 2) * rinv_l
    ke_r = 0.5 * (q_r[mu] ** 2 + q_r[mv] ** 2) * rinv_r
    p_l = (gamma - 1.0) * (q_l[3] - ke_l)
    p_r = (gamma - 1.0) * (q_r[3] - ke_r)
    H = (srl * ((q_l[3] + p_l) * rinv_l)
         + srr * ((q_r[3] + p_r) * rinv_r)) * w
    a2 = (gamma - 1.0) * (H - 0.5 * (u * u + v * v))
    return u, v, H, a2, jnp.sqrt(a2)


def _rpn2_euler_soa(ixy, q_l, q_r, params, tracer=False):
    """rpn2_euler_4wave/5wave in SoA form (waves as per-equation 2D
    arrays; see classic/soa.py)."""
    gamma = params["gamma"]
    g1 = gamma - 1.0
    mu = 1 + ixy
    mv = 2 - ixy
    u, v, H, a2, a = _roe_averages_soa(q_l, q_r, gamma, mu, mv)

    d0 = q_r[0] - q_l[0]
    dmu = q_r[mu] - q_l[mu]
    dmv = q_r[mv] - q_l[mv]
    dE = q_r[3] - q_l[3]

    euv = H - (u * u + v * v)
    a3, a4 = _alpha34(g1, a, a2, u,
                      euv * d0 + u * dmu + v * dmv - dE,
                      dmu + (a - u) * d0)
    a2w = dmv - v * d0
    a1 = d0 - a3 - a4

    def mk(rho_c, mu_c, mv_c, e_c, t_c=None):
        comp = [None] * len(q_l)
        comp[0] = rho_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        comp[3] = e_c
        if tracer:
            comp[4] = t_c
        return tuple(comp)

    if tracer:
        srl, srr = jnp.sqrt(q_l[0]), jnp.sqrt(q_r[0])
        phat = (srl * (q_l[4] / q_l[0]) + srr * (q_r[4] / q_r[0])) \
            / (srl + srr)
        t1, t2, t4 = a1 * phat, a3 * phat, a4 * phat
        a5 = (q_r[4] - q_l[4]) - phat * d0
    else:
        t1 = t2 = t4 = None
        a5 = None

    waves = [
        mk(a1, a1 * (u - a), a1 * v, a1 * (H - u * a), t1),
        mk(a3, a3 * u, a3 * v, a3 * 0.5 * (u * u + v * v), t2),
        mk(None, None, a2w, a2w * v, None),
        mk(a4, a4 * (u + a), a4 * v, a4 * (H + u * a), t4),
    ]
    speeds = [u - a, u, u, u + a]
    if tracer:
        waves.append(mk(None, None, None, None, a5))
        speeds.append(u)
    return tuple(waves), tuple(speeds)


def _rpn2_euler_4wave_soa(ixy, q_l, q_r, params):
    return _rpn2_euler_soa(ixy, q_l, q_r, params, tracer=False)


def _rpn2_euler_5wave_soa(ixy, q_l, q_r, params):
    return _rpn2_euler_soa(ixy, q_l, q_r, params, tracer=True)


def _prefactor_euler_2d_soa(ixy, qs_l, qs_r, params):
    """SoA variant of _prefactor_euler_2d (RiemannSolver.prefactor_soa)."""
    mu, mv = 1 + ixy, 2 - ixy
    return _roe_averages_soa(qs_l, qs_r, params["gamma"], mu, mv)


def _rpt2_euler_soa(ixy, imp, q_l, q_r, asdq, params, eig=None):
    """rpt2_euler in SoA form: same eigen-algebra as _rpt2_euler."""
    gamma = params["gamma"]
    g1 = gamma - 1.0
    mu = 1 + ixy
    mv = 2 - ixy
    if eig is None:
        u, v, H, a2, a = _roe_averages_soa(q_l, q_r, gamma, mu, mv)
    else:
        u, v, H, a2, a = eig

    d0, dmu, dmv, dE = asdq[0], asdq[mu], asdq[mv], asdq[3]
    euv = H - (u * u + v * v)
    b3 = g1 / a2 * (euv * d0 + u * dmu + v * dmv - dE)
    b2w = dmu - u * d0
    b4 = (dmv + (a - v) * d0 - a * b3) / (2.0 * a)
    b1 = d0 - b3 - b4

    def mk(rho_c, mu_c, mv_c, e_c):
        comp = [None] * len(q_l)
        comp[0] = rho_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        comp[3] = e_c
        return tuple(comp)

    waves = (
        mk(b1, b1 * u, b1 * (v - a), b1 * (H - v * a)),
        mk(b3, b3 * u, b3 * v, b3 * 0.5 * (u * u + v * v)),
        mk(None, b2w, None, b2w * u),
        mk(b4, b4 * u, b4 * (v + a), b4 * (H + v * a)),
    )
    speeds = (v - a, v, v, v + a)

    num_eqn = len(q_l)
    bm = [None] * num_eqn
    bp = [None] * num_eqn
    for e in range(num_eqn):
        for w, sp in zip(waves, speeds):
            if w[e] is None:
                continue
            bm_t = jnp.minimum(sp, 0.0) * w[e]
            bp_t = jnp.maximum(sp, 0.0) * w[e]
            bm[e] = bm_t if bm[e] is None else bm[e] + bm_t
            bp[e] = bp_t if bp[e] is None else bp[e] + bp_t
    if num_eqn == 5:    # passive tracer rides the transverse flow
        t_m = jnp.minimum(v, 0.0) * asdq[4]
        t_p = jnp.maximum(v, 0.0) * asdq[4]
        bm[4] = t_m if bm[4] is None else bm[4] + t_m
        bp[4] = t_p if bp[4] is None else bp[4] + t_p
    zero = jnp.zeros_like(asdq[0])
    bm = [zero if b is None else b for b in bm]
    bp = [zero if b is None else b for b in bp]
    return tuple(bm), tuple(bp)


def _prefactor_euler_2d(ixy, q_l, q_r, aux_l, aux_r, params):
    """Shared per-direction eigensystem for the 2D transverse solves
    (RiemannSolver.prefactor hook): the Roe averages both rpt2 calls
    (imp=1,2) at the same interfaces would otherwise each re-derive."""
    mu, mv = 1 + ixy, 2 - ixy
    (u, v), H, a, a2, _ = _roe_averages(q_l, q_r, params["gamma"], (mu, mv))
    return (u, v, H, a, a2)


def _rpt2_euler(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params, eig=None):
    """Transverse Roe solve (rpt2_euler.f90): split asdq into up/down-going
    parts using the eigenstructure of the transverse-direction Jacobian at
    the Roe average of (q_l, q_r).  ``eig`` (from _prefactor_euler_2d)
    supplies the Roe averages precomputed once per sweep direction —
    identical expressions, hoisted."""
    gamma = params["gamma"]
    g1 = gamma - 1.0
    mu = 1 + ixy          # normal component of the ORIGINAL sweep
    mv = 2 - ixy          # transverse component (the direction of this split)
    E = 3

    if eig is None:
        (u, v), H, a, a2, _ = _roe_averages(q_l, q_r, gamma, (mu, mv))
    else:
        u, v, H, a, a2 = eig
    # In the transverse direction the roles swap: propagation speed is v.
    d0, dmu, dmv, dE = asdq[0], asdq[mu], asdq[mv], asdq[E]

    euv = H - (u * u + v * v)
    b3 = g1 / a2 * (euv * d0 + u * dmu + v * dmv - dE)
    b2w = dmu - u * d0                 # shear in the transverse solve
    b4 = (dmv + (a - v) * d0 - a * b3) / (2.0 * a)
    b1 = d0 - b3 - b4

    num_eqn = q_l.shape[0]
    sp = d0.shape
    z = jnp.zeros(sp, asdq.dtype)

    def mk(rho_c, mu_c, mv_c, e_c):
        comp = [z] * num_eqn
        comp[0] = rho_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        comp[E] = e_c
        return jnp.stack(comp)

    w1 = mk(b1, b1 * u, b1 * (v - a), b1 * (H - v * a))
    w2 = mk(b3, b3 * u, b3 * v, b3 * 0.5 * (u * u + v * v))
    w3 = mk(z, b2w, z, b2w * u)
    w4 = mk(b4, b4 * u, b4 * (v + a), b4 * (H + v * a))
    speeds = [v - a, v, v, v + a]

    bmasdq = jnp.zeros_like(asdq)
    bpasdq = jnp.zeros_like(asdq)
    for w, sp_ in zip((w1, w2, w3, w4), speeds):
        bmasdq = bmasdq + jnp.minimum(sp_, 0.0) * w
        bpasdq = bpasdq + jnp.maximum(sp_, 0.0) * w

    if num_eqn == 5:
        # tracer rides the transverse flow
        bmasdq = bmasdq.at[4].add(jnp.minimum(v, 0.0) * asdq[4])
        bpasdq = bpasdq.at[4].add(jnp.maximum(v, 0.0) * asdq[4])
    return bmasdq, bpasdq


# ======================================================================
# 3D Roe solver (rpn3_euler.f90) + transverse (rpt3/rptt3)
# ======================================================================
def _rpn3_euler(ixy, q_l, q_r, aux_l, aux_r, params):
    gamma = params["gamma"]
    g1 = gamma - 1.0
    # component permutation per sweep direction
    mu = 1 + ixy
    mv = 1 + (ixy + 1) % 3
    mw = 1 + (ixy + 2) % 3
    E = 4

    (u, v, w_), H, a, a2, _ = _roe_averages(q_l, q_r, gamma, (mu, mv, mw))

    d = q_r - q_l
    d0, dmu, dmv, dmw, dE = d[0], d[mu], d[mv], d[mw], d[E]

    euv = H - (u * u + v * v + w_ * w_)
    a3 = g1 / a2 * (euv * d0 + u * dmu + v * dmv + w_ * dmw - dE)
    ash = dmv - v * d0                 # shear (v)
    ash2 = dmw - w_ * d0               # shear (w)
    a5 = (dmu + (a - u) * d0 - a * a3) / (2.0 * a)
    a1 = d0 - a3 - a5

    num_eqn = q_l.shape[0]
    sp = d0.shape
    z = jnp.zeros(sp, d.dtype)

    def mk(rho_c, mu_c, mv_c, mw_c, e_c):
        comp = [z] * num_eqn
        comp[0] = rho_c
        comp[mu] = mu_c
        comp[mv] = mv_c
        comp[mw] = mw_c
        comp[E] = e_c
        return jnp.stack(comp)

    w1 = mk(a1, a1 * (u - a), a1 * v, a1 * w_, a1 * (H - u * a))
    w2 = mk(a3, a3 * u, a3 * v, a3 * w_,
            a3 * 0.5 * (u * u + v * v + w_ * w_))
    w3 = mk(z, z, ash, z, ash * v)
    w4 = mk(z, z, z, ash2, ash2 * w_)
    w5 = mk(a5, a5 * (u + a), a5 * v, a5 * w_, a5 * (H + u * a))

    # Group the two shear waves with the entropy wave (3 distinct speeds);
    # reference rpn3 keeps 3 waves [uncertain]; we keep 5 explicit waves for
    # limiter granularity.
    wave = jnp.stack([w1, w2, w3, w4, w5], axis=1)
    s = jnp.stack([u - a, u, u, u, u + a])
    sneg = jnp.minimum(s, 0.0)
    spos = jnp.maximum(s, 0.0)
    amdq = _wsum(sneg, wave)
    apdq = _wsum(spos, wave)
    return wave, s, amdq, apdq


def _prefactor_euler_3d(ixy, q_l, q_r, aux_l, aux_r, params):
    """Shared per-direction eigensystem for the 3D transverse solves
    (RiemannSolver.prefactor hook).  All 4 rpt3 and 8 rptt3 calls per
    sweep direction evaluate the transverse eigen-decomposition at the
    SAME Roe average of (q_l, q_r); computing it once here removes 11/12
    of the sqrt/divide-heavy average derivations from the hot 3D step.
    Expressions match _split_transverse_euler's own exactly (fixed
    component order (1,2,3)) so hoisting is bitwise-neutral."""
    (u1, u2, u3), H, a, a2, _ = _roe_averages(q_l, q_r, params["gamma"],
                                              (1, 2, 3))
    ke = 0.5 * (u1 * u1 + u2 * u2 + u3 * u3)
    return ((u1, u2, u3), H, a, a2, ke)


def _split_transverse_euler(vel_comp, q_l, q_r, aux_l, aux_r, asdq, params,
                            normal_comp, eig=None):
    """Generic transverse split for 3D Euler in direction `vel_comp`
    (1=u,2=v,3=w momentum row): Roe-average eigen-decomposition of asdq in
    that direction.  ``eig`` (from _prefactor_euler_3d) supplies the Roe
    averages precomputed once per sweep direction."""
    gamma = params["gamma"]
    g1 = gamma - 1.0
    E = 4
    vel_idx = (1, 2, 3)
    if eig is None:
        (u1, u2, u3), H, a, a2, _ = _roe_averages(q_l, q_r, gamma, vel_idx)
        ke = 0.5 * (u1 * u1 + u2 * u2 + u3 * u3)
    else:
        (u1, u2, u3), H, a, a2, ke = eig
    vels = {1: u1, 2: u2, 3: u3}
    vt = vels[vel_comp]                 # propagation speed direction

    d0 = asdq[0]
    dE = asdq[E]
    dm = {i: asdq[i] for i in vel_idx}

    euv = H - 2.0 * ke
    b3 = g1 / a2 * (euv * d0 + u1 * dm[1] + u2 * dm[2] + u3 * dm[3] - dE)
    b5 = (dm[vel_comp] + (a - vt) * d0 - a * b3) / (2.0 * a)
    b1 = d0 - b3 - b5
    shear_comps = [i for i in vel_idx if i != vel_comp]
    bsh = {i: dm[i] - vels[i] * d0 for i in shear_comps}

    num_eqn = q_l.shape[0]
    z = jnp.zeros(d0.shape, asdq.dtype)

    def mk(rho_c, mom, e_c):
        comp = [z] * num_eqn
        comp[0] = rho_c
        for i in vel_idx:
            comp[i] = mom[i]
        comp[E] = e_c
        return jnp.stack(comp)

    # acoustic down
    mom1 = {i: b1 * vels[i] for i in vel_idx}
    mom1[vel_comp] = b1 * (vt - a)
    w1 = mk(b1, mom1, b1 * (H - vt * a))
    # entropy + both shear waves share speed vt: build their SUM as one
    # wave (3 distinct speeds instead of 5 accumulation terms — ~35%
    # fewer min/mult/add in the split, the dominant arithmetic of the
    # 36-splits-per-cell 3D transverse section; roundoff-level
    # regrouping relative to the separate-wave form)
    momm = {i: b3 * vels[i] + bsh[i] for i in shear_comps}
    momm[vel_comp] = b3 * vt
    wmid = mk(b3, momm,
              b3 * ke + bsh[shear_comps[0]] * vels[shear_comps[0]]
              + bsh[shear_comps[1]] * vels[shear_comps[1]])
    # acoustic up
    mom5 = {i: b5 * vels[i] for i in vel_idx}
    mom5[vel_comp] = b5 * (vt + a)
    w5 = mk(b5, mom5, b5 * (H + vt * a))

    waves = [w1, wmid, w5]
    speeds = [vt - a, vt, vt + a]

    bm = jnp.zeros_like(asdq)
    bp = jnp.zeros_like(asdq)
    for w, sp_ in zip(waves, speeds):
        bm = bm + jnp.minimum(sp_, 0.0) * w
        bp = bp + jnp.maximum(sp_, 0.0) * w
    return bm, bp


def _rpt3_euler(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params,
                trans_axis=None, eig=None):
    if trans_axis is None:
        trans_axis = (ixy + 1) % 3
    return _split_transverse_euler(1 + trans_axis, q_l, q_r, aux_l, aux_r,
                                   asdq, params, 1 + ixy, eig=eig)


def _rptt3_euler(ixy, icoor, imp, impt, q_l, q_r, aux_l, aux_r, bsasdq,
                 params, trans_axis=None, eig=None):
    if trans_axis is None:
        trans_axis = (ixy + 2) % 3
    return _split_transverse_euler(1 + trans_axis, q_l, q_r, aux_l, aux_r,
                                   bsasdq, params, 1 + ixy, eig=eig)


def _evec_euler_1d(ixy, q, aux, params):
    """Right/left eigenvector matrices of the 1D Euler Jacobian at each
    cell state (reference sharpclaw/evec.f90; used by char_decomp).
    Returns (R, L), each (num_eqn, num_eqn, *n), with L = R^-1 analytic."""
    gamma = params["gamma"]
    g1 = gamma - 1.0
    rho, mom, E = q[0], q[1], q[2]
    u = mom / rho
    p = g1 * (E - 0.5 * rho * u * u)
    a = jnp.sqrt(gamma * p / rho)
    H = (E + p) / rho

    one = jnp.ones_like(u)
    R = jnp.stack([
        jnp.stack([one, one, one]),
        jnp.stack([u - a, u, u + a]),
        jnp.stack([H - u * a, 0.5 * u * u, H + u * a]),
    ])
    b1 = g1 / (a * a)
    b2 = 0.5 * b1 * u * u
    L = jnp.stack([
        jnp.stack([0.5 * (b2 + u / a), -0.5 * (b1 * u + 1.0 / a), 0.5 * b1]),
        jnp.stack([1.0 - b2, b1 * u, -b1]),
        jnp.stack([0.5 * (b2 - u / a), -0.5 * (b1 * u - 1.0 / a), 0.5 * b1]),
    ])
    return R, L


def _evec_euler_nd(ixy, q, aux, params):
    """Eigenvector matrices of the multi-D Euler Jacobian along axis
    `ixy` at each cell state (sharpclaw evec hook; char_decomp for the
    2D 4-wave and 3D solvers).  Ordering of the characteristic fields:
    (u-a, entropy, shear(s), u+a)."""
    gamma = params["gamma"]
    g1 = gamma - 1.0
    num_eqn = q.shape[0]
    e_idx = num_eqn - 1
    vel_idx = list(range(1, num_eqn - 1))
    mu = 1 + ixy
    trans = [i for i in vel_idx if i != mu]
    rho = q[0]
    E = q[e_idx]
    vels = {i: q[i] / rho for i in vel_idx}
    un = vels[mu]
    V2 = sum(v * v for v in vels.values())
    p = g1 * (E - 0.5 * rho * V2)
    a = jnp.sqrt(gamma * p / rho)
    H = (E + p) / rho
    b1 = g1 / (a * a)
    b2 = 0.5 * b1 * V2
    one = jnp.ones_like(un)

    shape = (num_eqn, num_eqn) + un.shape
    R = jnp.zeros(shape, dtype=q.dtype)
    L = jnp.zeros(shape, dtype=q.dtype)

    # acoustic columns 0 (u-a) and num_eqn-1 (u+a)
    for col, sgn in ((0, -1.0), (num_eqn - 1, 1.0)):
        R = R.at[0, col].set(one)
        R = R.at[mu, col].set(un + sgn * a)
        for i in trans:
            R = R.at[i, col].set(vels[i])
        R = R.at[e_idx, col].set(H + sgn * un * a)
    # entropy column 1
    R = R.at[0, 1].set(one)
    for i in vel_idx:
        R = R.at[i, 1].set(vels[i])
    R = R.at[e_idx, 1].set(0.5 * V2)
    # shear columns: one per transverse momentum
    for col, i in zip(range(2, num_eqn - 1), trans):
        R = R.at[i, col].set(one)
        R = R.at[e_idx, col].set(vels[i])

    # left eigenvectors (analytic inverse)
    for row, sgn in ((0, -1.0), (num_eqn - 1, 1.0)):
        L = L.at[row, 0].set(0.5 * (b2 - sgn * un / a))
        L = L.at[row, mu].set(-0.5 * (b1 * un - sgn / a))
        for i in trans:
            L = L.at[row, i].set(-0.5 * b1 * vels[i])
        L = L.at[row, e_idx].set(0.5 * b1)
    L = L.at[1, 0].set(1.0 - b2)
    for i in vel_idx:
        L = L.at[1, i].set(b1 * vels[i])
    L = L.at[1, e_idx].set(-b1)
    for row, i in zip(range(2, num_eqn - 1), trans):
        L = L.at[row, 0].set(-vels[i])
        L = L.at[row, i].set(one)
    return R, L


def _make_euler_flux(ndim):
    """Physical Euler flux f(q) along sweep direction ixy (reference
    flux1.f90's tfluct-free total fluctuation uses f(qr)-f(ql); see
    riemann/__init__.py RiemannSolver.flux).  Any trailing passive
    tracer components are covered by the generic u*q advection term."""
    e_idx = 1 + ndim

    def flux(ixy, q, aux, params):
        gamma = params["gamma"]
        rho = q[0]
        u = q[1 + ixy] / rho
        ke = 0.5 * sum(q[1 + d] ** 2 for d in range(ndim)) / rho
        p = (gamma - 1.0) * (q[e_idx] - ke)
        f = u[None] * q                # every component advects with u
        f = f.at[1 + ixy].add(p)
        f = f.at[e_idx].add(u * p)
        return f
    return flux


def _flux_euler_2d_soa(ixy, qs, params, tracer=False):
    gamma = params["gamma"]
    mu, mv = 1 + ixy, 2 - ixy
    rho, E = qs[0], qs[3]
    if jnp.result_type(rho) == jnp.float64:
        u = qs[mu] / rho
        p = (gamma - 1.0) * (E - 0.5 * (qs[1] ** 2 + qs[2] ** 2) / rho)
    else:
        # f32 divide diet: share one reciprocal between the velocity
        # recovery and the kinetic-energy term (2 divides -> 1)
        rinv = 1.0 / rho
        u = qs[mu] * rinv
        p = (gamma - 1.0) * (E - 0.5 * (qs[1] ** 2 + qs[2] ** 2) * rinv)
    comp = [None] * len(qs)
    comp[0] = qs[mu]
    comp[mu] = qs[mu] * u + p
    comp[mv] = qs[mv] * u
    comp[3] = u * (E + p)
    if tracer:
        comp[4] = u * qs[4]
    return tuple(comp)


def _make_euler_positivity(vel_idx, e_idx):
    def positivity(q, aux, params):
        rho = q[0]
        ke = 0.5 * sum(q[i] ** 2 for i in vel_idx) / jnp.where(rho > 0.0,
                                                               rho, 1.0)
        p = (params["gamma"] - 1.0) * (q[e_idx] - ke)
        return (rho > 0.0) & (p > 0.0)
    return positivity


from . import RiemannSolver  # noqa: E402

euler_with_efix_1D = RiemannSolver("euler_with_efix_1D", 1, 3, 3,
                                   _rp1_euler_with_efix, requires=("gamma",))
euler_with_efix_1D.evec = _evec_euler_1d
euler_with_efix_1D.positivity = _make_euler_positivity((1,), 2)
euler_roe_1D = RiemannSolver("euler_roe_1D", 1, 3, 3,
                             _rp1_euler_roe_nofix, requires=("gamma",))
euler_roe_1D.evec = _evec_euler_1d
euler_roe_1D.positivity = _make_euler_positivity((1,), 2)
euler_hlle_1D = RiemannSolver("euler_hlle_1D", 1, 3, 2,
                              _rp1_euler_hlle, requires=("gamma",))
euler_4wave_2D = RiemannSolver("euler_4wave_2D", 2, 4, 4,
                               _rpn2_euler_4wave, rpt=_rpt2_euler,
                               requires=("gamma",))
euler_4wave_2D.rpn_soa = _rpn2_euler_4wave_soa
euler_4wave_2D.rpt_soa = _rpt2_euler_soa
euler_4wave_2D.prefactor = _prefactor_euler_2d
euler_4wave_2D.prefactor_soa = _prefactor_euler_2d_soa
euler_5wave_2D = RiemannSolver("euler_5wave_2D", 2, 5, 5,
                               _rpn2_euler_5wave, rpt=_rpt2_euler,
                               requires=("gamma",))
euler_5wave_2D.rpn_soa = _rpn2_euler_5wave_soa
euler_5wave_2D.rpt_soa = _rpt2_euler_soa
euler_5wave_2D.prefactor = _prefactor_euler_2d
euler_5wave_2D.prefactor_soa = _prefactor_euler_2d_soa
euler_3D = RiemannSolver("euler_3D", 3, 5, 5, _rpn3_euler,
                         rpt=_rpt3_euler, rptt=_rptt3_euler,
                         requires=("gamma",))
euler_3D.prefactor = _prefactor_euler_3d
# rpt3/rptt3 ignore imp/icoor and are linear in asdq with broadcasting
# algebra -> eligible for the kernel's batched transverse path
euler_3D.transverse_batchable = True

euler_hlle_1D.positivity = _make_euler_positivity((1,), 2)
euler_4wave_2D.positivity = _make_euler_positivity((1, 2), 3)
euler_4wave_2D.evec = _evec_euler_nd
euler_3D.evec = _evec_euler_nd
euler_5wave_2D.positivity = _make_euler_positivity((1, 2), 3)
euler_3D.positivity = _make_euler_positivity((1, 2, 3), 4)

for _s in (euler_with_efix_1D, euler_roe_1D, euler_hlle_1D):
    _s.flux = _make_euler_flux(1)
euler_4wave_2D.flux = _make_euler_flux(2)
euler_4wave_2D.flux_soa = _flux_euler_2d_soa
euler_5wave_2D.flux = _make_euler_flux(2)
euler_5wave_2D.flux_soa = lambda ixy, qs, params: _flux_euler_2d_soa(
    ixy, qs, params, tracer=True)
euler_3D.flux = _make_euler_flux(3)
