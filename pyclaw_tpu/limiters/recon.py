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
    vm2 = _shift(q, -2)
    vm1 = _shift(q, -1)
    v0 = q
    vp1 = _shift(q, 1)
    vp2 = _shift(q, 2)

    # smoothness indicators (Jiang-Shu), shared by both edges
    b0 = (13.0 / 12.0) * (vm2 - 2.0 * vm1 + v0) ** 2 \
        + 0.25 * (vm2 - 4.0 * vm1 + 3.0 * v0) ** 2
    b1 = (13.0 / 12.0) * (vm1 - 2.0 * v0 + vp1) ** 2 \
        + 0.25 * (vm1 - vp1) ** 2
    b2 = (13.0 / 12.0) * (v0 - 2.0 * vp1 + vp2) ** 2 \
        + 0.25 * (3.0 * v0 - 4.0 * vp1 + vp2) ** 2

    ib0 = 1.0 / (EPWENO + b0) ** 2
    ib1 = 1.0 / (EPWENO + b1) ** 2
    ib2 = 1.0 / (EPWENO + b2) ** 2

    # right edge  (ideal weights 1/10, 6/10, 3/10)
    p0 = (2.0 * vm2 - 7.0 * vm1 + 11.0 * v0) / 6.0
    p1 = (-vm1 + 5.0 * v0 + 2.0 * vp1) / 6.0
    p2 = (2.0 * v0 + 5.0 * vp1 - vp2) / 6.0
    a0 = 0.1 * ib0
    a1 = 0.6 * ib1
    a2 = 0.3 * ib2
    qr = (a0 * p0 + a1 * p1 + a2 * p2) / (a0 + a1 + a2)

    # left edge  (mirror: ideal weights 3/10, 6/10, 1/10)
    m0 = (-vm2 + 5.0 * vm1 + 2.0 * v0) / 6.0
    m1 = (2.0 * vm1 + 5.0 * v0 - vp1) / 6.0
    m2 = (11.0 * v0 - 7.0 * vp1 + 2.0 * vp2) / 6.0
    c0 = 0.3 * ib0
    c1 = 0.6 * ib1
    c2 = 0.1 * ib2
    ql = (c0 * m0 + c1 * m1 + c2 * m2) / (c0 + c1 + c2)

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
