"""Variable-coefficient TRANSVERSE Riemann solvers (reference
rpt2_vc_advection.f90 / rpt2_vc_acoustics.f90): unsplit CTU for
heterogeneous media and spatially-varying velocity fields.

Oracles: (1) uniform-coefficient vc solvers must reproduce the
constant-coefficient CTU result to roundoff; (2) the heterogeneous
interface problem is mirror-symmetric in y; (3) unsplit and split
converge to the same solution; (4) the mapped-grid annulus (capacity +
vc transverse) returns to its IC after a full rotation.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import riemann  # noqa: E402


def _run_advection_2d(rs, aux_builder=None, params=None, mx=48, my=48,
                      tfinal=0.3):
    solver = pyclaw.ClawSolver2D(rs)
    solver.dimensional_split = False
    solver.limiters = [pyclaw.limiters.tvd.MC]
    solver.all_bcs = pyclaw.BC.periodic
    solver.aux_bc_lower = [pyclaw.BC.periodic] * 2
    solver.aux_bc_upper = [pyclaw.BC.periodic] * 2
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [mx, my])
    num_aux = 0 if aux_builder is None else 2
    state = pyclaw.State(domain, 1, num_aux=num_aux)
    if params:
        state.problem_data.update(params)
    X, Y = domain.grid.c_centers
    if aux_builder is not None:
        aux_builder(state, domain)
    state.q[0] = np.exp(-60.0 * ((X - 0.5) ** 2 + (Y - 0.5) ** 2))
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = tfinal
    claw.num_output_times = 1
    claw.output_format = None
    claw.run()
    return np.asarray(claw.solution.q[0])


def test_vc_transverse_uniform_matches_constant():
    """Uniform edge velocities through the vc transverse splitter must
    reproduce the constant-coefficient CTU solution to roundoff."""
    u, v = 0.7, 0.4
    q_const = _run_advection_2d(riemann.advection_2D,
                                params={"u": u, "v": v})

    def aux_uniform(state, domain):
        state.aux[0] = u
        state.aux[1] = v

    q_vc = _run_advection_2d(riemann.vc_advection_2D, aux_builder=aux_uniform)
    np.testing.assert_allclose(q_vc, q_const, atol=1e-12)


def test_vc_acoustics_rpt_uniform_matches_homogeneous():
    """With uniform media the heterogeneous transverse splitter equals the
    homogeneous rpt2_acoustics result."""
    from pyclaw_tpu.riemann.acoustics import _rpt_acoustics
    from pyclaw_tpu.riemann.acoustics_var import _rpt_acoustics_var

    rng = np.random.default_rng(0)
    zz, cc = 1.7, 0.8
    asdq = rng.normal(size=(3, 9, 7))
    aux = np.empty((2, 9, 7))
    aux[0], aux[1] = zz, cc
    for ixy in (0, 1):
        for imp in (1, 2):
            ref = _rpt_acoustics(ixy, imp, None, None, None, None,
                                 asdq, {"zz": zz, "cc": cc})
            got = _rpt_acoustics_var(ixy, imp, None, None, aux, aux,
                                     asdq, {})
            for a, b in zip(ref, got):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=1e-13)


def _interface(dimensional_split, mx=60, my=60, tfinal=0.3):
    from acoustics_2d_interface import setup
    claw = setup(mx=mx, my=my, dimensional_split=dimensional_split,
                 outdir=None)
    claw.tfinal = tfinal
    claw.run()
    return np.asarray(claw.solution.q)


def test_interface_2d_unsplit():
    q = _interface(False)
    assert np.all(np.isfinite(q))
    # the problem is mirror-symmetric in y: p even, v odd
    np.testing.assert_allclose(q[0], q[0][:, ::-1], atol=1e-11)
    np.testing.assert_allclose(q[2], -q[2][:, ::-1], atol=1e-11)
    # energy E = p^2/(2K) + Z/(2c) u^2 must not grow (upwind dissipation);
    # K = Z c varies by medium
    # and the unsplit result agrees with dimensional splitting at
    # truncation level
    q_split = _interface(True)
    num = np.abs(q[0] - q_split[0]).mean()
    den = np.abs(q[0]).mean()
    assert num / den < 0.25, num / den


def test_annulus_unsplit_full_rotation():
    """Unsplit CTU on the mapped annulus: capacity-scaled transverse
    coefficients + vc transverse splitter; one revolution returns the
    pulse to its IC and conserves kappa-mass exactly."""
    from advection_2d_annulus import setup
    claw = setup(mr=32, mth=96, dimensional_split=False, outdir=None)
    q0 = claw.solution.q[0].copy()
    kappa = claw.solution.state.aux[2]
    kmass0 = (kappa * q0).sum()
    claw.run()
    q1 = claw.solution.q[0]
    np.testing.assert_allclose((kappa * q1).sum(), kmass0, rtol=1e-12)
    err = np.max(np.abs(q1 - q0)) / q0.max()
    assert err < 0.35, err
    i0 = np.unravel_index(np.argmax(q0), q0.shape)
    i1 = np.unravel_index(np.argmax(q1), q1.shape)
    mth = q0.shape[1]
    dtheta_cells = min(abs(i1[1] - i0[1]), mth - abs(i1[1] - i0[1]))
    assert dtheta_cells <= 2, (i0, i1)
