"""Shallow water on a rotating sphere — f-wave Riemann solver.

Capability parity with reference ``riemann/src/rpn2_shallow_sphere.f90``
(examples/shallow_sphere; SURVEY.md §2.9), REDESIGNED for this framework:
instead of the reference's Calhoun-Helzel-LeVeque double-cover grid with
3D Cartesian momenta and per-edge rotation matrices, we solve directly in
spherical (lon, lat) = (lambda, theta) coordinates on a lat-lon patch
with q = (h, hu, hv) (u zonal, v meridional, true velocities):

    kappa h_t  + (h u)_lambda / a + (kappa h v)_theta / a         = 0
    kappa(hu)_t + (hu^2+p)_lambda / a + (kappa huv)_theta / a     = kappa S_u
    kappa(hv)_t + (huv)_lambda / a + (kappa(hv^2+p))_theta / a    = kappa S_v

with kappa = cos(theta) (the capacity / area element), p = g h^2 / 2, and
geometric + Coriolis sources (src2.f90 equivalent, see
:func:`make_sphere_source`):

    S_u =  (f + u tan(theta)/a) h v
    S_v = -(f + u tan(theta)/a) h u + tan(theta)/a * p

The theta-flux carries kappa INSIDE the f-wave with cell-centered values
(Z = kappa_r G(q_r) - kappa_l G(q_l)), so the kappa-weighted divergence
telescopes exactly (conservation of kappa-weighted mass to roundoff) and
the p dkappa/dtheta metric contribution is captured; the lambda-flux is
unweighted.  Use with ``solver.fwave = True`` and ``state.index_capa``
pointing at the cos(theta) aux row.

aux rows: aux[0] = cos(theta) at the cell's LOWER theta edge (kept for
edge-based diagnostics); aux[1] = cos(theta) at the cell center
(capacity; also used inside the f-wave).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_shallow_sphere_fwave(ixy, q_l, q_r, aux_l, aux_r, params):
    g = params["grav"]
    h_l, h_r = q_l[0], q_r[0]
    mu = 1 + ixy          # normal momentum component
    mv = 2 - ixy          # transverse momentum component

    u_l = q_l[mu] / h_l
    u_r = q_r[mu] / h_r
    v_l = q_l[mv] / h_l
    v_r = q_r[mv] / h_r

    # Roe averages
    sqh_l = jnp.sqrt(h_l)
    sqh_r = jnp.sqrt(h_r)
    h_bar = 0.5 * (h_l + h_r)
    u_hat = (sqh_l * u_l + sqh_r * u_r) / (sqh_l + sqh_r)
    v_hat = (sqh_l * v_l + sqh_r * v_r) / (sqh_l + sqh_r)
    c_hat = jnp.sqrt(g * h_bar)

    # flux difference in the normal direction
    # F = (h un, h un^2 + p, h un ut) in (h, mu, mv) component order.
    # theta direction: the f-wave differences the FULL kappa-weighted
    # flux with the CELL-CENTERED kappa of each side (like the
    # conservative vc-advection f-wave): Z = kap_r G(q_r) - kap_l G(q_l).
    # An edge-shared kappa_e (G_r - G_l) would discretize kappa dG/dtheta
    # and silently drop the p dkappa/dtheta metric contribution (caught
    # by the Williamson TC2 steady-state residual test).
    p_l = 0.5 * g * h_l * h_l
    p_r = 0.5 * g * h_r * h_r
    if ixy == 1:
        kap_l = aux_l[1]
        kap_r = aux_r[1]
    else:
        kap_l = kap_r = 1.0
    dF0 = kap_r * q_r[mu] - kap_l * q_l[mu]
    dFmu = kap_r * (q_r[mu] * u_r + p_r) - kap_l * (q_l[mu] * u_l + p_l)
    dFmv = kap_r * q_r[mu] * v_r - kap_l * q_l[mu] * v_l

    # project onto Roe eigenvectors r1=(1,u-c,v), r2=(0,0,1), r3=(1,u+c,v)
    # (components ordered (h, mu, mv))
    b1 = ((u_hat + c_hat) * dF0 - dFmu) / (2.0 * c_hat)
    b3 = (dFmu - (u_hat - c_hat) * dF0) / (2.0 * c_hat)
    b2 = dFmv - v_hat * dF0

    num_eqn = q_l.shape[0]
    shape = h_l.shape
    wave = jnp.zeros((num_eqn, 3) + shape, dtype=q_l.dtype)
    wave = wave.at[0, 0].set(b1)
    wave = wave.at[mu, 0].set(b1 * (u_hat - c_hat))
    wave = wave.at[mv, 0].set(b1 * v_hat)
    wave = wave.at[mv, 1].set(b2)
    wave = wave.at[0, 2].set(b3)
    wave = wave.at[mu, 2].set(b3 * (u_hat + c_hat))
    wave = wave.at[mv, 2].set(b3 * v_hat)

    s = jnp.stack([u_hat - c_hat, u_hat, u_hat + c_hat])

    # f-wave fluctuations: left-going waves into amdq, right-going to apdq
    amdq = jnp.zeros_like(q_l)
    apdq = jnp.zeros_like(q_l)
    for p in range(3):
        neg = s[p] < 0.0
        amdq = amdq + jnp.where(neg, wave[:, p], 0.0)
        apdq = apdq + jnp.where(neg, 0.0, wave[:, p])
    return wave, s, amdq, apdq


def make_sphere_source(grid, radius=1.0, omega=0.0, grav=1.0):
    """Coriolis + metric source hook (reference shallow_sphere src2.f90
    equivalent) for ClawSolver.step_source: a Heun (RK2) update of

        (hu)_t =  (f + u tan(theta)/a) h v
        (hv)_t = -(f + u tan(theta)/a) h u - tan(theta)/a * (g h^2/2)

    with f = 2 omega sin(theta).  The -tan(theta) p term compensates the
    kappa-weighting of the pressure inside the theta flux
    (1/a d_theta p = 1/(a kappa) d_theta(kappa p) + tan(theta)/a p);
    steadiness of the Williamson TC2 geostrophic balance pins the sign.
    Traceable: closes over the static latitude array."""
    import numpy as np
    theta = np.asarray(grid.c_centers[1])
    tanth = jnp.asarray(np.tan(theta))
    f_cor = jnp.asarray(2.0 * omega * np.sin(theta))
    a = radius

    def rates(q):
        h, hu, hv = q[0], q[1], q[2]
        u = hu / h
        coef = f_cor + u * tanth / a
        s_hu = coef * hv
        s_hv = -coef * hu - (tanth / a) * (0.5 * grav * h * h)
        return jnp.stack([jnp.zeros_like(h), s_hu, s_hv])

    def step_source(solver, state, q, dt):
        k1 = rates(q)
        k2 = rates(q + dt * k1)
        return q + 0.5 * dt * (k1 + k2)

    return step_source


from . import RiemannSolver  # noqa: E402

shallow_sphere_fwave_2D = RiemannSolver("shallow_sphere_fwave_2D", 2, 3, 3,
                                        _rp_shallow_sphere_fwave,
                                        requires=("grav",))
