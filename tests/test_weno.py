"""WENO reconstruction orders 5..17 (reference weno.f90) — table
correctness, design accuracy on smooth data, and end-to-end solver
convergence at high order."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyclaw_tpu.limiters import recon


@pytest.mark.parametrize("order", [5, 7, 9, 11, 13, 17])
def test_weno_smooth_accuracy(order):
    """On smooth data the WENO weights approach the ideal weights and the
    edge reconstruction converges at the design order (measure slope)."""
    k = (order + 1) // 2
    errs = []
    for n in (32, 64):
        x = (np.arange(n) + 0.5) / n
        h = 1.0 / n
        # cell averages of sin(2 pi x)
        q = (np.cos(2 * np.pi * (x - h / 2)) - np.cos(2 * np.pi * (x + h / 2))) \
            / (2 * np.pi * h)
        ql, qr = recon.weno(order, jnp.asarray(q[None]))
        qr = np.asarray(qr[0])
        exact_r = np.sin(2 * np.pi * (x + h / 2))
        # interior only (stencil width k)
        sl = slice(k, n - k)
        errs.append(np.max(np.abs(qr[sl] - exact_r[sl])))
    if order <= 9:
        rate = np.log2(errs[0] / errs[1])
        assert rate > order - 1.2, (order, errs, rate)
    else:
        # orders >= 11 sit at the f64 roundoff floor already at n=32 —
        # which is itself the accuracy statement
        assert errs[0] < 1e-10, (order, errs)


def test_weno_tables_sum_to_one():
    for order in (5, 7, 9, 11, 13, 15, 17):
        k = (order + 1) // 2
        c_r, c_l, d_r, d_l, B = recon._weno_tables(k)
        np.testing.assert_allclose(np.sum(c_r, axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.sum(c_l, axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(d_r.sum(), 1.0, atol=1e-12)
        np.testing.assert_allclose(d_l.sum(), 1.0, atol=1e-12)
        assert np.all(d_r > 0) and np.all(d_l > 0)
        # smoothness forms are PSD
        for Bl in B:
            ev = np.linalg.eigvalsh(0.5 * (Bl + Bl.T))
            assert ev.min() > -1e-10


@pytest.mark.parametrize("order", [7, 9])
def test_sharpclaw_high_order_advection(order):
    """End-to-end: SharpClaw with WENO7/9 on smooth advection beats WENO5
    at the same resolution."""
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann

    def run(weno_order, nx=64):
        solver = pyclaw.SharpClawSolver1D(riemann.advection_1D)
        solver.weno_order = weno_order
        solver.time_integrator = "SSP104"
        solver.all_bcs = pyclaw.BC.periodic
        domain = pyclaw.Domain([0.0], [1.0], [nx])
        state = pyclaw.State(domain, 1)
        state.problem_data["u"] = 1.0
        x = domain.grid.x.centers
        state.q[0, :] = np.sin(2 * np.pi * x)
        claw = pyclaw.Controller()
        claw.solution = pyclaw.Solution(state, domain)
        claw.solver = solver
        claw.tfinal = 1.0
        claw.num_output_times = 1
        claw.output_format = None
        claw.run()
        return np.max(np.abs(claw.solution.q[0]
                             - np.sin(2 * np.pi * x)))

    err5 = run(5)
    err_hi = run(order)
    assert err_hi < err5, (err5, err_hi)


def test_weno5_f32_constant_data_finite():
    """Regression: the reference epweno=1e-36 underflows in float32
    ((eps+0)^2 -> 0 -> inf/NaN wherever the data is locally constant —
    e.g. the quadrants IC).  The f32 path uses scale-invariant rational
    weights and must be finite and exact on constant states, and match
    the f64 reference weights to f32 roundoff on smooth data."""
    import jax.numpy as jnp
    q = jnp.full((2, 32), 3.25, dtype=jnp.float32)
    ql, qr = recon.weno5(q)
    assert np.all(np.isfinite(np.asarray(ql)))
    np.testing.assert_allclose(np.asarray(qr)[:, 3:-3], 3.25, rtol=2e-7)

    x = np.linspace(0.0, 2 * np.pi, 128)
    qs = np.sin(x)[None]
    _, r64 = recon.weno5(jnp.asarray(qs))
    _, r32 = recon.weno5(jnp.asarray(qs, dtype=jnp.float32))
    assert np.abs(np.asarray(r64) - np.asarray(r32))[:, 3:-3].max() < 1e-5


def test_weno_high_order_f32_constant_data_finite():
    """Same f32 underflow regression as order 5, for the generic-order
    path (review r3 finding 1): orders 7..17 on constant f32 data must
    be finite and exact, and f64 must be untouched."""
    for order in (7, 9, 11):
        q = jnp.full((1, 64), 1.0, dtype=jnp.float32)
        ql, qr = recon.weno(order, q)
        k = (order + 1) // 2
        assert np.all(np.isfinite(np.asarray(qr))), order
        np.testing.assert_allclose(np.asarray(qr)[0, k:-k], 1.0,
                                   rtol=2e-7)
    # f64 path unchanged: matches golden-style smooth reconstruction
    x = np.linspace(0.0, 2 * np.pi, 128)
    qs = np.sin(x)[None]
    _, r64 = recon.weno(7, jnp.asarray(qs))
    _, r32 = recon.weno(7, jnp.asarray(qs, dtype=jnp.float32))
    assert np.abs(np.asarray(r64) - np.asarray(r32))[:, 4:-4].max() < 1e-5
