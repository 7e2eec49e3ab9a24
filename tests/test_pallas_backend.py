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
    """Fused 2D unsplit sweep (ops/sweep2d.py) vs the XLA kernel — full
    CTU incl. transverse terms must agree to roundoff."""
    mod = __import__(example)
    runs = {}
    for backend in ("xla", "pallas"):
        claw = mod.setup(solver_type="classic", kernel_language=backend,
                         outdir=None, **kw)
        claw.tfinal = 0.1
        claw.num_output_times = 1
        claw.run()
        runs[backend] = claw.solution.q.copy()
    np.testing.assert_allclose(runs["pallas"], runs["xla"], atol=1e-12)
