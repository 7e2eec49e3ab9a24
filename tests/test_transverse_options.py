"""Transverse-option fidelity oracle (reference flux2.f90 method(3)).

An INDEPENDENT numpy re-implementation of the flux2 corner-transport
algebra for constant-coefficient 2D advection (plain loops + rolls, no
shared code with pyclaw_tpu.classic.kernels) pins each transverse_waves
option exactly:

  0 - no transverse propagation,
  1 - transverse transport of the first-order fluctuations (CTU),
  2 - additionally transports the second-order correction waves
      (flux2.f90 folds cqxx into amdq/apdq before the rpt2 split when
      method(2)>1 and method(3)==2).

Also asserts options 1 and 2 genuinely differ (the round-1 gap: 2
behaved as 1)."""

import numpy as np
import pytest

import jax.numpy as jnp

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann

G = 2  # num_ghost


def flux2_advection_numpy(q, u, v, dt, dx, dy, transverse_waves, order=2):
    """One unsplit classic step for q_t + u q_x + v q_y = 0, periodic BCs.

    q: (n, m) interior cells.  Returns interior q_new.  Unlimited
    (phi == 1) so the correction-flux algebra is exercised exactly.
    """
    n, m = q.shape
    qp = np.pad(q, G, mode="wrap")          # periodic ghost extension
    nx, ny = qp.shape
    dtdx, dtdy = dt / dx, dt / dy

    # ---- normal sweeps ------------------------------------------------
    # x-interface k in [0, nx-2] between cells k, k+1
    wave_x = qp[1:, :] - qp[:-1, :]          # (nx-1, ny)
    amdq_x = min(u, 0.0) * wave_x
    apdq_x = max(u, 0.0) * wave_x
    cqxx = 0.5 * abs(u) * (1.0 - abs(u) * dtdx) * wave_x if order == 2 \
        else np.zeros_like(wave_x)

    wave_y = qp[:, 1:] - qp[:, :-1]          # (nx, ny-1)
    amdq_y = min(v, 0.0) * wave_y
    apdq_y = max(v, 0.0) * wave_y
    cqyy = 0.5 * abs(v) * (1.0 - abs(v) * dtdy) * wave_y if order == 2 \
        else np.zeros_like(wave_y)

    Fx = cqxx.copy()
    Gy = cqyy.copy()

    if transverse_waves > 0:
        if transverse_waves >= 2 and order == 2:
            am_x, ap_x = amdq_x + cqxx, apdq_x - cqxx
            am_y, ap_y = amdq_y + cqyy, apdq_y - cqyy
        else:
            am_x, ap_x = amdq_x, apdq_x
            am_y, ap_y = amdq_y, apdq_y

        # x-sweep transverse -> Gy.  asdq at x-interface k splits into
        # bm = min(v,0) asdq (down-going), bp = max(v,0) asdq (up-going);
        # target cell row i = k (for A-) or k+1 (for A+):
        #   Gy[i, j-1] -= 0.5 dtdx bm[k, j];  Gy[i, j] -= 0.5 dtdx bp[k, j]
        for i0, asdq in ((0, am_x), (1, ap_x)):
            bm = min(v, 0.0) * asdq
            bp = max(v, 0.0) * asdq
            for k in range(nx - 1):
                i = k + i0
                for j in range(1, ny):
                    Gy[i, j - 1] -= 0.5 * dtdx * bm[k, j]
                for j in range(0, ny - 1):
                    Gy[i, j] -= 0.5 * dtdx * bp[k, j]

        # y-sweep transverse -> Fx (roles swapped)
        for j0, bsdq in ((0, am_y), (1, ap_y)):
            am = min(u, 0.0) * bsdq
            ap = max(u, 0.0) * bsdq
            for k in range(ny - 1):
                j = k + j0
                for i in range(1, nx):
                    Fx[i - 1, j] -= 0.5 * dtdy * am[i, k]
                for i in range(0, nx - 1):
                    Fx[i, j] -= 0.5 * dtdy * ap[i, k]

    # ---- update (cells 1..nx-2 / 1..ny-2 of the padded array) ---------
    q_new = qp.copy()
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            q_new[i, j] = qp[i, j] \
                - dtdx * (apdq_x[i - 1, j] + amdq_x[i, j]
                          + Fx[i, j] - Fx[i - 1, j]) \
                - dtdy * (apdq_y[i, j - 1] + amdq_y[i, j]
                          + Gy[i, j] - Gy[i, j - 1])
    return q_new[G:nx - G, G:ny - G]


def _one_step(q0, u, v, dt, n, m, transverse_waves, order=2):
    solver = pyclaw.ClawSolver2D(riemann.advection_2D)
    solver.order = order
    solver.limiters = [0]
    solver.transverse_waves = transverse_waves
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [n, m])
    state = pyclaw.State(domain, 1)
    state.problem_data.update(u=u, v=v)
    state.q[0] = q0
    solver.setup(pyclaw.Solution(state, domain))
    q_new, _ = solver._step_fn(jnp.asarray(state.q), None, dt, 0.0)
    return np.asarray(q_new[0])


@pytest.mark.parametrize("vels", [(0.9, 0.6), (0.9, -0.6), (-0.5, -0.8)])
@pytest.mark.parametrize("tw", [0, 1, 2])
def test_flux2_options_vs_numpy_oracle(vels, tw):
    u, v = vels
    n, m = 12, 10
    rng = np.random.default_rng(7)
    q0 = rng.standard_normal((n, m))
    dt = 0.5 / max(n, m)
    got = _one_step(q0, u, v, dt, n, m, tw)
    want = flux2_advection_numpy(q0, u, v, dt, 1.0 / n, 1.0 / m, tw)
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_option_2_differs_from_1():
    n, m = 12, 10
    rng = np.random.default_rng(3)
    q0 = rng.standard_normal((n, m))
    dt = 0.5 / n
    q1 = _one_step(q0, 0.9, 0.6, dt, n, m, 1)
    q2 = _one_step(q0, 0.9, 0.6, dt, n, m, 2)
    assert np.max(np.abs(q1 - q2)) > 1e-6


def test_option_2_second_order_convergence():
    """Smooth advection: full option-2 unsplit CTU converges at 2nd order."""
    errs = []
    for n in (32, 64):
        x = (np.arange(n) + 0.5) / n
        q0 = np.sin(2 * np.pi * x)[:, None] * np.cos(2 * np.pi * x)[None, :]
        u, v = 1.0, 0.5
        nsteps = n  # dt = 0.8/n per step -> fixed final time t=0.8
        dt = 0.8 / n
        solver = pyclaw.ClawSolver2D(riemann.advection_2D)
        solver.order = 2
        solver.limiters = [0]
        solver.transverse_waves = 2
        solver.dt_initial = dt
        solver.dt_variable = False
        solver.all_bcs = pyclaw.BC.periodic
        domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [n, n])
        state = pyclaw.State(domain, 1)
        state.problem_data.update(u=u, v=v)
        state.q[0] = q0
        sol = pyclaw.Solution(state, domain)
        solver.evolve_to_time(sol, nsteps * dt)
        t = nsteps * dt
        xs = (x - u * t) % 1.0
        ys = (x - v * t) % 1.0
        exact = np.sin(2 * np.pi * xs)[:, None] * np.cos(2 * np.pi * ys)[None, :]
        errs.append(np.max(np.abs(sol.q[0] - exact)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, (errs, rate)
