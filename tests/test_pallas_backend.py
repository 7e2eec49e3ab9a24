"""Dual-backend oracle (SURVEY.md §4): the Pallas fused kernels must
reproduce the XLA reference kernels to roundoff — the TPU analog of the
reference's Fortran-vs-Python kernel cross-check.  On CPU the Pallas
kernels run in interpret mode (the 'sanitizer', SURVEY.md §5.2)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import jax.numpy as jnp  # noqa: E402
from pyclaw_tpu import riemann  # noqa: E402


def test_weno5_pallas_matches_xla():
    from pyclaw_tpu.limiters.recon import weno5
    from pyclaw_tpu.ops import weno5_pallas
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((3, 4, 64)))
    ql_x, qr_x = weno5(q)
    ql_p, qr_p = weno5_pallas(q)
    np.testing.assert_allclose(np.asarray(ql_p), np.asarray(ql_x),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(qr_p), np.asarray(qr_x),
                               atol=1e-13)


@pytest.mark.parametrize("example,kw", [
    ("advection_1d", {}),
    ("acoustics_1d", {}),
    ("euler_1d_shocktube", {"nx": 200}),
])
def test_classic_pallas_backend_matches_xla(example, kw):
    mod = __import__(example)
    runs = {}
    for backend in ("xla", "pallas"):
        claw = mod.setup(solver_type="classic", kernel_language=backend,
                         outdir=None, **kw)
        claw.run()
        runs[backend] = claw.solution.q.copy()
    np.testing.assert_allclose(runs["pallas"], runs["xla"], atol=1e-12)


def test_sharpclaw_pallas_weno_matches_xla():
    import advection_1d
    runs = {}
    for backend in ("xla", "pallas"):
        claw = advection_1d.setup(solver_type="sharpclaw",
                                  kernel_language=backend, outdir=None)
        claw.run()
        runs[backend] = claw.solution.q.copy()
    np.testing.assert_allclose(runs["pallas"], runs["xla"], atol=1e-12)


@pytest.mark.parametrize("example,kw", [
    ("acoustics_2d", {"mx": 40, "my": 40}),
    ("euler_2d_quadrants", {"mx": 40, "my": 40}),
])
def test_classic_2d_pallas_backend_matches_xla(example, kw):
    """Fused 2D unsplit sweep vs the XLA kernel — full CTU incl.
    transverse terms must agree to roundoff.  (With SoA-eligible solvers
    the pallas backend runs the TILED kernel, whose body is independent
    of kernels.step2 — see the multi-tile test below for the explicit
    tiling oracle.)"""
    mod = __import__(example)
    runs = {}
    for backend in ("xla", "pallas"):
        claw = mod.setup(solver_type="classic", kernel_language=backend,
                         outdir=None, **kw)
        if backend == "xla":
            claw.solver.use_soa = False     # generic AoS reference path
        claw.tfinal = 0.1
        claw.num_output_times = 1
        claw.run()
        runs[backend] = claw.solution.q.copy()
    np.testing.assert_allclose(runs["pallas"], runs["xla"], atol=1e-12)


@pytest.mark.parametrize("tw", [0, 1, 2])
def test_tiled_pallas_multi_tile_oracle(tw):
    """The genuinely tiled kernel (ops/tiled2d.py): grid divided into
    multiple (8, 128)-style tiles with a halo apron per tile, compared
    against the INDEPENDENT generic AoS kernel (kernels.step2).  Asserts
    the tiling really divided the grid."""
    import jax

    from pyclaw_tpu import riemann
    from pyclaw_tpu.classic import kernels
    from pyclaw_tpu.ops import tiled2d

    g = 2
    nx, ny = 32, 64
    tile = (8, 32)
    assert tiled2d.tile_grid((nx, ny), tile) == (4, 2)  # multi-tile!

    rng = np.random.default_rng(5)
    qbc = np.empty((4, nx + 2 * g, ny + 2 * g))
    qbc[0] = 1.0 + 0.5 * rng.random(qbc.shape[1:])
    qbc[1] = 0.3 * rng.standard_normal(qbc.shape[1:])
    qbc[2] = 0.3 * rng.standard_normal(qbc.shape[1:])
    qbc[3] = 2.5 + rng.random(qbc.shape[1:])
    qbc = jnp.asarray(qbc)
    params = {"gamma": 1.4}
    mthlim = (1, 3, 4, 2)
    dt, dx, dy = 1e-3, 1.0 / nx, 1.0 / ny
    rp = riemann.euler_4wave_2D

    q_t, c_t = jax.jit(lambda q: tiled2d.step2_pallas_tiled(
        q, dt, dx, dy, rp.rpn_soa, rp.rpt_soa, params, mthlim, 2, g,
        transverse_waves=tw, tile=tile))(qbc)
    q_x, c_x = kernels.step2(qbc, None, dt, dx, dy, rp.rp, rp.rpt,
                             params, mthlim, 2, False, -1, g,
                             transverse_waves=tw)
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_x),
                               atol=1e-13)
    assert abs(float(c_t) - float(c_x)) < 1e-13


def test_tiled_pallas_generic_aux_capacity():
    """The GENERIC tiled Pallas kernel (VERDICT r2 item 8): aux-carrying
    variable-coefficient advection with a capacity function, multi-tile
    halo-apron DMA, vs the monolithic generic kernel."""
    import jax

    from pyclaw_tpu import riemann
    from pyclaw_tpu.classic import kernels
    from pyclaw_tpu.ops import tiled2d

    g = 2
    nx, ny = 32, 64
    tile = (8, 32)
    rng = np.random.default_rng(9)
    qbc = jnp.asarray(rng.random((1, nx + 2 * g, ny + 2 * g)))
    # aux: edge velocities u, v + capacity kappa
    auxbc = jnp.asarray(np.stack([
        1.0 + 0.3 * rng.random((nx + 2 * g, ny + 2 * g)),
        0.5 + 0.3 * rng.random((nx + 2 * g, ny + 2 * g)),
        1.0 + 0.2 * rng.random((nx + 2 * g, ny + 2 * g)),
    ]))
    rp = riemann.vc_advection_2D
    params = {}
    dt, dx, dy = 1e-3, 1.0 / nx, 1.0 / ny

    q_t, c_t = jax.jit(lambda q, a: tiled2d.step2_pallas_tiled_generic(
        q, a, dt, dx, dy, rp.rp, rp.rpt, params, (4,), 2, False, 2, g,
        transverse_waves=2, tile=tile))(qbc, auxbc)
    q_x, c_x = kernels.step2(qbc, auxbc, dt, dx, dy, rp.rp, rp.rpt,
                             params, (4,), 2, False, 2, g,
                             transverse_waves=2)
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_x),
                               atol=1e-13)
    assert abs(float(c_t) - float(c_x)) < 1e-13


def test_pallas_single_block_vmem_guard():
    """backend='pallas' on a big grid whose shape defeats tiling must
    fail loudly with guidance, not OOM deep inside Mosaic (VERDICT r2
    weak 7)."""
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann

    solver = pyclaw.ClawSolver2D(riemann.euler_4wave_2D)
    solver.backend = "pallas"
    solver.use_soa = False
    solver.all_bcs = pyclaw.BC.extrap
    # 900 is not divisible by 8/128 tiling and far beyond the VMEM budget
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [900, 900])
    state = pyclaw.State(domain, 4)
    state.problem_data["gamma"] = 1.4
    state.q[0] = 1.0
    state.q[3] = 2.5
    with pytest.raises(ValueError, match="VMEM"):
        solver.setup(pyclaw.Solution(state, domain))


def _one_step(solver_type, backend, **solver_kw):
    import euler_2d_quadrants as mod
    claw = mod.setup(solver_type=solver_type, kernel_language=backend,
                     outdir=None, mx=64, my=128, **solver_kw)
    s = claw.solver
    s.setup(claw.solution)
    q = jnp.asarray(claw.solution.state.q)
    qn, cfl = s._step_fn(q, None, 1e-4, 0.0)
    return np.asarray(qn), float(cfl)


def test_rows_kernel_classic_matches_xla():
    """The round-5 row-tiled Mosaic-legal kernel (step2_pallas_rows +
    roll-form SoA body + fused-pad BC) engages when the width is a
    128-multiple; one fixed-dt step must match the XLA path to a few
    ulp (a full adaptive run amplifies 1-ulp differences through the
    shocks into O(1e-4) — measured, not a bug — so the oracle is the
    deterministic single step)."""
    q_x, c_x = _one_step("classic", "xla")
    q_p, c_p = _one_step("classic", "pallas")
    np.testing.assert_allclose(q_p, q_x, atol=1e-14)
    assert abs(c_x - c_p) < 1e-14


def test_rows_kernel_sharpclaw_matches_xla():
    """dq_pallas_rows (roll-form WENO5 dq) vs the XLA SoA path: one
    fixed-dt SSP33 step to a few ulp (see the classic variant for why
    not a full run)."""
    q_x, c_x = _one_step("sharpclaw", "xla", time_integrator="SSP33")
    q_p, c_p = _one_step("sharpclaw", "pallas", time_integrator="SSP33")
    np.testing.assert_allclose(q_p, q_x, atol=1e-14)
    assert abs(c_x - c_p) < 1e-14


def test_step2_soa_roll_bitexact():
    """soa.step2_soa_roll must reproduce step2_soa bit-for-bit on the
    interior for every transverse_waves mode (the wrap-garbage
    containment proof in its docstring, checked)."""
    from pyclaw_tpu.classic import soa

    rng = np.random.default_rng(0)
    rp = riemann.euler_4wave_2D
    q = np.ones((4, 32, 48))
    q[0] = 1.0 + 0.1 * rng.random((32, 48))
    q[1] = 0.1 * rng.random((32, 48))
    q[2] = 0.05
    q[3] = 2.5 + 0.1 * rng.random((32, 48))
    qj = jnp.asarray(q)
    params = {"gamma": 1.4}
    for tw in (0, 1, 2):
        a, ca = soa.step2_soa(qj, 1e-3, 0.01, 0.01, rp.rpn_soa,
                              rp.rpt_soa, params, (4,) * 4, 2, 2,
                              transverse_waves=tw)
        b, cb = soa.step2_soa_roll(qj, 1e-3, 0.01, 0.01, rp.rpn_soa,
                                   rp.rpt_soa, params, (4,) * 4, 2, 2,
                                   transverse_waves=tw)
        assert bool(jnp.all(a == b)) and float(ca) == float(cb)


def test_dq_soa_roll_bitexact():
    """sharpclaw soa.dq_2d_soa_roll == dq_2d_soa bit-for-bit, with and
    without the per-system flux fast path."""
    from pyclaw_tpu.sharpclaw import soa as sc_soa

    rng = np.random.default_rng(1)
    rp = riemann.euler_4wave_2D
    q = np.ones((4, 40, 56))
    q[0] = 1.0 + 0.1 * rng.random((40, 56))
    q[1] = 0.1 * rng.random((40, 56))
    q[2] = 0.05
    q[3] = 2.5 + 0.1 * rng.random((40, 56))
    qj = jnp.asarray(q)
    params = {"gamma": 1.4}
    for flux in (rp.flux_soa, None):
        a, ca = sc_soa.dq_2d_soa(qj, 1e-3, 0.01, 0.01, rp.rpn_soa,
                                 params, 5, 3, positivity=rp.positivity,
                                 flux_soa=flux)
        b, cb = sc_soa.dq_2d_soa_roll(qj, 1e-3, 0.01, 0.01, rp.rpn_soa,
                                      params, 5, 3,
                                      positivity=rp.positivity,
                                      flux_soa=flux)
        assert bool(jnp.all(a == b)) and float(ca) == float(cb)


def test_rows_kernel_generic_aux_capacity_matches_xla():
    """The generic-AoS roll body (kernels.step2_roll) through the solver
    dispatch: an aux+capacity system (annulus-class vc advection) on a
    128-multiple width — one fixed-dt step vs the XLA path."""
    from advection_2d_annulus import setup
    runs = {}
    for backend in ("xla", "pallas"):
        claw = setup(mr=64, mth=128, outdir=None)
        s = claw.solver
        s.backend = backend
        s.setup(claw.solution)
        q = jnp.asarray(claw.solution.state.q)
        aux = jnp.asarray(claw.solution.state.aux)
        qn, cfl = s._step_fn(q, aux, 1e-4, 0.0)
        runs[backend] = (np.asarray(qn), float(cfl))
    np.testing.assert_allclose(runs["pallas"][0], runs["xla"][0],
                               atol=1e-14)
    assert abs(runs["pallas"][1] - runs["xla"][1]) < 1e-14


def test_step2_roll_bitexact_generic():
    """kernels.step2_roll == step2 bit-for-bit: euler (tw 0/1/2),
    vc advection with aux+capacity, and an fwave bathymetry system."""
    from pyclaw_tpu.classic import kernels

    rng = np.random.default_rng(4)
    rp = riemann.euler_4wave_2D
    q = np.ones((4, 24, 36))
    q[0] = 1.0 + 0.1 * rng.random((24, 36))
    q[1] = 0.1
    q[2] = 0.05
    q[3] = 2.5 + 0.1 * rng.random((24, 36))
    qj = jnp.asarray(q)
    for tw in (0, 1, 2):
        a, ca = kernels.step2(qj, None, 1e-3, 0.1, 0.1, rp.rp, rp.rpt,
                              {"gamma": 1.4}, (4,) * 4, 2, False, -1, 2,
                              transverse_waves=tw, prefactor=rp.prefactor)
        b, cb = kernels.step2_roll(qj, None, 1e-3, 0.1, 0.1, rp.rp,
                                   rp.rpt, {"gamma": 1.4}, (4,) * 4, 2,
                                   False, -1, 2, transverse_waves=tw,
                                   prefactor=rp.prefactor)
        assert bool(jnp.all(a == b)) and float(ca) == float(cb)

    rp2 = riemann.vc_advection_2D
    q2 = jnp.asarray(rng.random((1, 24, 36)))
    aux2 = jnp.asarray(np.stack([1.0 + 0.3 * rng.random((24, 36)),
                                 0.5 + 0.3 * rng.random((24, 36)),
                                 1.0 + 0.2 * rng.random((24, 36))]))
    a, ca = kernels.step2(q2, aux2, 1e-3, 0.1, 0.1, rp2.rp, rp2.rpt, {},
                          (4,), 2, False, 2, 2, transverse_waves=2)
    b, cb = kernels.step2_roll(q2, aux2, 1e-3, 0.1, 0.1, rp2.rp, rp2.rpt,
                               {}, (4,), 2, False, 2, 2,
                               transverse_waves=2)
    assert bool(jnp.all(a == b)) and float(ca) == float(cb)

    rp3 = riemann.shallow_bathymetry_fwave_2D
    q3 = np.ones((3, 24, 36))
    q3[0] = 2.0 + 0.2 * rng.random((24, 36))
    q3[1] = 0.1
    q3[2] = 0.05
    aux3 = jnp.asarray(0.3 * rng.random((1, 24, 36)))
    a, ca = kernels.step2(jnp.asarray(q3), aux3, 1e-3, 0.1, 0.1, rp3.rp,
                          rp3.rpt, {"grav": 9.8}, (4,) * 3, 2, True, -1,
                          2, transverse_waves=1)
    b, cb = kernels.step2_roll(jnp.asarray(q3), aux3, 1e-3, 0.1, 0.1,
                               rp3.rp, rp3.rpt, {"grav": 9.8}, (4,) * 3,
                               2, True, -1, 2, transverse_waves=1)
    assert bool(jnp.all(a == b)) and float(ca) == float(cb)
