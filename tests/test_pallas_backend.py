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
