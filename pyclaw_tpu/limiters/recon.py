"""High-order reconstruction: WENO5 (and TVD-linear) cell-edge values.

Rebuild of reference ``src/pyclaw/sharpclaw/weno.f90`` (weno5, :~1-1000) and
``src/pyclaw/limiters/recon.py`` (:~1-300; SURVEY.md §2.3/§2.4) as pure jnp
stencil arithmetic — compile-time coefficient tables, branch-free nonlinear
weights, pure VPU work on TPU.

Convention (SharpClaw): for every cell i, reconstruct the value at its LEFT
edge ``ql[i]`` and RIGHT edge ``qr[i]``.  The Riemann problem at interface
i-1/2 is then (qr[i-1], ql[i]).  Operates on the LAST axis; leading axes
(num_eqn, pencils) broadcast.  The first/last 2 cells of the output are
invalid (stencil truncation) — callers keep num_ghost >= 3 so interior
updates never read them.
"""

from __future__ import annotations

import jax.numpy as jnp

EPWENO = 1e-36  # reference sharpclaw epweno (weno.f90)


def _shift(q, k):
    """q shifted so that out[..., i] = q[..., i+k] (edge values replicate —
    invalid band, see module docstring)."""
    return jnp.roll(q, -k, axis=-1)


def weno5(q):
    """Fifth-order JS-WENO edge reconstruction.

    q: (..., n) cell averages.  Returns (ql, qr), each (..., n):
    ql[..., i] = value at left edge of cell i (x_{i-1/2}^+),
    qr[..., i] = value at right edge of cell i (x_{i+1/2}^-).
    """
    return weno5_stencil(_shift(q, -2), _shift(q, -1), q,
                         _shift(q, 1), _shift(q, 2))


def weno5_stencil(vm2, vm1, v0, vp1, vp2):
    """WENO5 edge values from explicit per-cell stencil arrays (used by
    the characteristic-decomposition path, where the stencil values are
    projections onto the target cell's eigenvectors — reference
    weno.f90 weno5_char).

    Two weight formulations by dtype:

      float64 (correctness regime): the reference's exact arithmetic —
        alpha_k = d_k / (epweno + beta_k)^2 with epweno = 1e-36
        (weno.f90), bitwise the golden-test behavior.

      float32 (TPU perf regime): the same 1e-36 epsilon UNDERFLOWS in
        f32 ((eps+0)^2 -> 0 -> inf/NaN on locally constant data), so the
        betas are first normalized by their sum (the weights are
        scale-invariant ratios, so this is exact in real arithmetic) and
        the classical absolute epsilon 1e-6 (Jiang-Shu) is applied to
        the normalized betas.  Rational weight assembly needs 1 divide
        for the normalization + 1 per edge instead of the reference's 5
        — measured ~17% faster on the cfg4 SharpClaw benchmark, and NaN-
        free on constant states (tests/test_weno.py pins both).
    """

    # smoothness indicators (Jiang-Shu), shared by both edges
    b0 = (13.0 / 12.0) * (vm2 - 2.0 * vm1 + v0) ** 2 \
        + 0.25 * (vm2 - 4.0 * vm1 + 3.0 * v0) ** 2
    b1 = (13.0 / 12.0) * (vm1 - 2.0 * v0 + vp1) ** 2 \
        + 0.25 * (vm1 - vp1) ** 2
    b2 = (13.0 / 12.0) * (v0 - 2.0 * vp1 + vp2) ** 2 \
        + 0.25 * (3.0 * v0 - 4.0 * vp1 + vp2) ** 2

    # right edge  (ideal weights 1/10, 6/10, 3/10)
    p0 = (2.0 * vm2 - 7.0 * vm1 + 11.0 * v0) / 6.0
    p1 = (-vm1 + 5.0 * v0 + 2.0 * vp1) / 6.0
    p2 = (2.0 * v0 + 5.0 * vp1 - vp2) / 6.0
    # left edge  (mirror: ideal weights 3/10, 6/10, 1/10)
    m0 = (-vm2 + 5.0 * vm1 + 2.0 * v0) / 6.0
    m1 = (2.0 * vm1 + 5.0 * v0 - vp1) / 6.0
    m2 = (11.0 * v0 - 7.0 * vp1 + 2.0 * vp2) / 6.0

    if jnp.result_type(v0) == jnp.float64:
        ib0 = 1.0 / (EPWENO + b0) ** 2
        ib1 = 1.0 / (EPWENO + b1) ** 2
        ib2 = 1.0 / (EPWENO + b2) ** 2
        a0, a1, a2 = 0.1 * ib0, 0.6 * ib1, 0.3 * ib2
        qr = (a0 * p0 + a1 * p1 + a2 * p2) / (a0 + a1 + a2)
        c0, c1, c2 = 0.3 * ib0, 0.6 * ib1, 0.1 * ib2
        ql = (c0 * m0 + c1 * m1 + c2 * m2) / (c0 + c1 + c2)
        return ql, qr

    # f32: scale-invariant rational weights (see docstring).  The e_k
    # are scaled by 1e3 (folded into the reciprocal's numerator — free):
    # the weights are ratios, so a common factor in e cancels exactly,
    # and it re-centers the 4th-power products for the merged
    # normalization below (unscaled, constant data puts every e_k at
    # 1e-6 and den_r*den_l at ~1e-48 -> f32 underflow -> inf).  With the
    # scale, e_k in [1e-3, 1e3], each den in [~1e-13, ~1e12], and the
    # den product in [~1e-26, ~1e24] — safely inside f32 range.
    r = 1e3 / (b0 + b1 + b2 + 1e-30)
    e0 = 1e-3 + b0 * r
    e1 = 1e-3 + b1 * r
    e2 = 1e-3 + b2 * r
    s01 = (e0 * e1) ** 2
    s02 = (e0 * e2) ** 2
    s12 = (e1 * e2) ** 2              # alpha_k proportional to d_k*s_jk
    a0, a1, a2 = 0.1 * s12, 0.6 * s02, 0.3 * s01
    c0, c1, c2 = 0.3 * s12, 0.6 * s02, 0.1 * s01
    # one reciprocal normalizes BOTH edges (round-5 divide diet):
    # qr = num_r/den_r, ql = num_l/den_l computed as
    # num_r*(den_l*inv), num_l*(den_r*inv) with inv = 1/(den_r*den_l) —
    # 3 extra muls to save one of the three divides per stencil.
    den_r = a0 + a1 + a2
    den_l = c0 + c1 + c2
    inv = 1.0 / (den_r * den_l)
    qr = (a0 * p0 + a1 * p1 + a2 * p2) * (den_l * inv)
    ql = (c0 * m0 + c1 * m1 + c2 * m2) * (den_r * inv)
    return ql, qr


# ----------------------------------------------------------------------
# Generic odd-order JS-WENO (orders 5,7,...,17 — reference weno.f90's
# hardcoded per-order tables, derived here numerically at build time).
# ----------------------------------------------------------------------
import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _weno_tables(k):
    """Coefficient tables for WENO of order 2k-1 (k = stencil width).

    Returns (c_right, c_left, d_right, d_left, B):
      c_right[l, j]: reconstruction coeff of cell value v_{i-k+1+l+j} for
                     the RIGHT edge of cell i from candidate stencil l
      d_right[l]:    ideal weight of stencil l for the right edge
      (left-edge variants by symmetry)
      B[l]:          (k, k) SPD quadratic-form matrix of the Jiang-Shu
                     smoothness indicator: beta_l = v_l^T B[l] v_l where
                     v_l are the k cell values of stencil l.
    All computed from Lagrange interpolation of the primitive function and
    exact polynomial integration (float64), matching the published tables
    to roundoff.
    """
    # --- reconstruction coefficients: stencil l uses cells
    #     {i-k+1+l, ..., i+l}; evaluate interpolant at x = +1/2 (right
    #     edge) and -1/2 (left edge), cell i centered at 0, width 1.
    def recon_coeffs(l, xi):
        # primitive-function approach: V(x) = int v; V at cell edges.
        # cells m = -k+1+l .. l, edges at m-1/2 .. ; coefficient of v_m in
        # derivative of Lagrange interpolant of V through the k+1 edges.
        edges = np.array([m - 0.5 for m in range(-k + 1 + l, l + 2)])
        coeffs = np.zeros(k)
        # dV/dx at xi of the Lagrange polynomial through (edges, V);
        # V_edge_j = sum_{m < j} v_m  -> coefficient extraction
        nE = k + 1
        for j in range(nE):
            # derivative of Lagrange basis L_j at xi
            others = [edges[a] for a in range(nE) if a != j]
            denom = np.prod([edges[j] - o for o in others])
            dsum = 0.0
            for a in range(len(others)):
                term = 1.0
                for b in range(len(others)):
                    if b != a:
                        term *= (xi - others[b])
                dsum += term
            dLj = dsum / denom
            # V_j = sum_{m=0}^{j-1} v_{(-k+1+l)+m}
            for m in range(j):
                coeffs[m] += dLj
        return coeffs

    c_right = np.array([recon_coeffs(l, 0.5) for l in range(k)])
    c_left = np.array([recon_coeffs(l, -0.5) for l in range(k)])

    # --- full (2k-1)-cell optimal coefficients, for the ideal weights
    def full_coeffs(xi):
        edges = np.array([m - 0.5 for m in range(-k + 1, k + 1)])
        nE = 2 * k
        coeffs = np.zeros(2 * k - 1)
        for j in range(nE):
            others = [edges[a] for a in range(nE) if a != j]
            denom = np.prod([edges[j] - o for o in others])
            dsum = 0.0
            for a in range(len(others)):
                term = 1.0
                for b in range(len(others)):
                    if b != a:
                        term *= (xi - others[b])
                dsum += term
            dLj = dsum / denom
            for m in range(j):
                coeffs[m] += dLj
        return coeffs

    def ideal_weights(c_stencils, xi):
        # solve sum_l d_l * c_stencils[l] (embedded) == full_coeffs(xi)
        A = np.zeros((2 * k - 1, k))
        for l in range(k):
            A[l:l + k, l] += c_stencils[l]
        b = full_coeffs(xi)
        d, *_ = np.linalg.lstsq(A, b, rcond=None)
        return d

    d_right = ideal_weights(c_right, 0.5)
    d_left = ideal_weights(c_left, -0.5)

    # --- smoothness indicators: beta_l = sum_{m=1}^{k-1}
    #     int_{-1/2}^{1/2} (d^m p_l / dx^m)^2 dx  (unit cell width)
    # p_l: degree k-1 polynomial with cell averages v over stencil l.
    B = []
    for l in range(k):
        # basis: for each cell value v_m, polynomial e_m(x) = contribution.
        # Build p_l coefficients as linear map M: poly_coeffs = M @ v.
        # Conditions: average of p over cell c equals v_c for the k cells.
        cells = list(range(-k + 1 + l, l + 1))
        A = np.zeros((k, k))  # A[c, p] = avg of x^p over cell c
        for ci, c in enumerate(cells):
            for p in range(k):
                a, b2 = c - 0.5, c + 0.5
                A[ci, p] = (b2 ** (p + 1) - a ** (p + 1)) / (p + 1)
        M = np.linalg.inv(A)  # (poly coeff in monomials) x (cell values)
        Bl = np.zeros((k, k))
        for m in range(1, k):
            # m-th derivative of x^p: factor fall(p,m) x^{p-m}
            D = np.zeros((k, k))  # deriv in monomial basis
            for p in range(m, k):
                fact = 1.0
                for t in range(m):
                    fact *= (p - t)
                D[p - m, p] = fact
            Dm = D @ M                    # v -> coeffs of d^m p/dx^m
            # Gram matrix of monomials on [-1/2, 1/2]
            G = np.zeros((k, k))
            for p in range(k):
                for q2 in range(k):
                    if (p + q2) % 2 == 0:
                        G[p, q2] = 2 * (0.5 ** (p + q2 + 1)) / (p + q2 + 1)
            Bl += Dm.T @ G @ Dm
        B.append(Bl)
    return c_right, c_left, d_right, d_left, np.array(B)


def weno(order, q):
    """Generic odd-order JS-WENO edge reconstruction (order = 5,7,...,17;
    reference weno.f90 weno5..weno17).  Same convention as weno5: returns
    (ql, qr) per cell."""
    if order == 5:
        return weno5(q)
    if order % 2 == 0 or order < 3:
        raise ValueError("WENO order must be odd >= 3")
    k = (order + 1) // 2
    shifts = [_shift(q, m) for m in range(-k + 1, k)]
    return weno_stencil(order, shifts)


def weno_stencil(order, shifts):
    """Generic-order WENO edge values from explicit per-cell stencil
    arrays ``shifts[m+k-1] = v_{i+m}`` for m in [-k+1, k-1] (used by the
    characteristic-decomposition path, where the stencil values are
    projections onto the target cell's eigenvectors — reference
    weno.f90 weno5_char and friends)."""
    if order == 5:
        return weno5_stencil(*shifts)
    k = (order + 1) // 2
    if len(shifts) != 2 * k - 1:
        raise ValueError(f"weno_stencil(order={order}) needs {2 * k - 1} "
                         f"stencil arrays, got {len(shifts)}")
    c_right, c_left, d_right, d_left, B = (
        [np.asarray(a) for a in _weno_tables(k)])

    # smoothness indicators, shared by both edges
    betas = []
    for l in range(k):
        beta = 0.0
        cells = [shifts[(-k + 1 + l + j) + k - 1] for j in range(k)]
        for a in range(k):
            for b in range(k):
                coeff = float(B[l][a, b])
                if coeff != 0.0:
                    beta = beta + coeff * cells[a] * cells[b]
        betas.append(beta)

    f64 = jnp.result_type(shifts[0]) == jnp.float64
    if f64:
        eps = EPWENO
    else:
        # float32: the reference's absolute 1e-36 underflows when
        # squared ((eps+0)^2 -> 0 -> inf/NaN on locally constant data,
        # same issue fixed in weno5_stencil); normalize the betas (the
        # weights are scale-invariant ratios — exact in real
        # arithmetic) and use the classical JS epsilon.
        r = 1.0 / (sum(betas) + 1e-30)
        betas = [b * r for b in betas]
        eps = 1e-6

    def edge(c_tab, d_tab):
        num = 0.0
        den = 0.0
        for l in range(k):
            cells = [shifts[(-k + 1 + l + j) + k - 1] for j in range(k)]
            p = 0.0
            for j in range(k):
                p = p + float(c_tab[l, j]) * cells[j]
            alpha = float(d_tab[l]) / (eps + betas[l]) ** 2
            num = num + alpha * p
            den = den + alpha
        return num / den

    qr = edge(c_right, d_right)
    ql = edge(c_left, d_left)
    return ql, qr


def tvd2(q, limiter_id=4):
    """Second-order TVD-limited linear reconstruction (SharpClaw
    lim_type=1; reference reconstruct.f90 tvd2 path).  MC limiter default."""
    from . import tvd as tvdmod
    dqm = q - _shift(q, -1)            # q_i - q_{i-1}
    dqp = _shift(q, 1) - q             # q_{i+1} - q_i
    safe = dqp != 0.0
    theta = jnp.where(safe, dqm / jnp.where(safe, dqp, 1.0), 0.0)
    phi = tvdmod._phi(limiter_id, theta)
    phi = jnp.where(safe, phi, 0.0)
    slope = phi * dqp                  # limited slope * dx
    ql = q - 0.5 * slope
    qr = q + 0.5 * slope
    return ql, qr
