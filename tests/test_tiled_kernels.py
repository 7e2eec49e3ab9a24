"""Row-tiled generic (AoS) kernel drivers vs monolithic kernels:
step2_tiled / step3_tiled must be bit-identical to step2 / step3
(dual-path oracle for the VMEM-blocking production fast path)."""

import numpy as np
import jax.numpy as jnp

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _step2_generic(tile):
    solver = pyclaw.ClawSolver2D(riemann.shallow_roe_with_efix_2D)
    solver.all_bcs = pyclaw.BC.extrap
    solver.soa_tile_rows = tile
    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [32, 24])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["grav"] = 1.0
    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    state.q[0] = np.where(r < 0.5, 2.0, 1.0)
    state.q[1] = 0.0
    state.q[2] = 0.0
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    assert not solver._soa_eligible(state)   # efix custom amdq -> generic
    q, cfl = solver._step_fn(jnp.asarray(state.q), None, 1e-3, 0.0)
    return np.asarray(q), float(cfl)


def test_step2_tiled_matches_monolithic():
    q_t, c_t = _step2_generic(8)
    q_u, c_u = _step2_generic(0)
    np.testing.assert_allclose(q_t, q_u, atol=1e-14)
    assert abs(c_t - c_u) < 1e-14


def _step2_generic_aux(tile):
    """Generic kernel with aux + capacity (annulus vc advection)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from advection_2d_annulus import setup
    claw = setup(mr=24, mth=16, outdir=None)
    claw.solver.soa_tile_rows = tile
    claw.tfinal = 0.05
    claw.num_output_times = 1
    claw.run()
    return np.asarray(claw.solution.q)


def test_step2_tiled_aux_capacity():
    q_t = _step2_generic_aux(8)
    q_u = _step2_generic_aux(0)
    np.testing.assert_allclose(q_t, q_u, atol=1e-13)


def _step3(tile):
    solver = pyclaw.ClawSolver3D(riemann.euler_3D)
    solver.all_bcs = pyclaw.BC.extrap
    solver.soa_tile_rows = tile
    domain = pyclaw.Domain([-1.0] * 3, [1.0] * 3, [16, 12, 12])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["gamma"] = 1.4
    x, y, z = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    state.q[0] = np.where(r < 0.5, 2.0, 1.0)
    state.q[1] = 0.0
    state.q[2] = 0.0
    state.q[3] = 0.0
    state.q[4] = np.where(r < 0.5, 5.0, 2.5)
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    q, cfl = solver._step_fn(jnp.asarray(state.q), None, 1e-3, 0.0)
    return np.asarray(q), float(cfl)


def test_step3_tiled_matches_monolithic():
    q_t, c_t = _step3(4)
    q_u, c_u = _step3(0)
    np.testing.assert_allclose(q_t, q_u, atol=1e-14)
    assert abs(c_t - c_u) < 1e-14


def test_step3_asymmetric_tile_matches_monolithic():
    """(x_cap, y_cap) pairs stitch bit-identically (the production 3D
    tile is asymmetric after the r4 on-chip scans)."""
    q_t, c_t = _step3((8, 4))
    q_u, c_u = _step3(0)
    np.testing.assert_allclose(q_t, q_u, atol=1e-14)
    assert abs(c_t - c_u) < 1e-14


def test_step3_phased_matches_tiled():
    """step3_phased (normal sweeps hoisted out of the tile loop) must
    match the fused tiled step to roundoff — same contract as
    tiled-vs-monolithic."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.euler_3D
    rng = np.random.default_rng(3)
    q = np.ones((5, 20, 20, 20))
    q[0] = 1.0 + 0.1 * rng.random((20, 20, 20))
    q[1:4] = 0.2 * rng.random((3, 20, 20, 20))
    q[4] = 2.5 + 0.2 * rng.random((20, 20, 20))
    qj = jnp.asarray(q)
    params = {"gamma": 1.4}
    args = (None, 1e-3, 0.1, 0.1, 0.1, rp.rp, rp.rpt, rp.rptt, params,
            (1,) * 5, 2, False, -1, 2)
    qt, ct = kernels.step3_tiled(qj, *args, transverse_waves=2,
                                 tile_rows=4, prefactor=rp.prefactor)
    qp, cp = kernels.step3_phased(qj, *args, transverse_waves=2,
                                  tile_rows=(8, 4), prefactor=rp.prefactor)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qt), atol=1e-14)
    assert abs(float(ct) - float(cp)) < 1e-14


def test_step3_phased_aux_path():
    """step3_phased must also slice aux slabs correctly: variable-
    coefficient 3D acoustics (aux-carrying, rpt-only -> tw=1)."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.vc_acoustics_3D
    rng = np.random.default_rng(11)
    n = 20
    q = jnp.asarray(0.1 * rng.random((4, n, n, n)))
    aux = jnp.asarray(1.0 + 0.2 * rng.random((2, n, n, n)))
    args = (aux, 1e-3, 0.1, 0.1, 0.1, rp.rp, rp.rpt, None, {},
            (1,) * 2, 2, False, -1, 2)
    qt, ct = kernels.step3_tiled(q, *args, transverse_waves=1, tile_rows=4)
    qp, cp = kernels.step3_phased(q, *args, transverse_waves=1,
                                  tile_rows=4)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qt), atol=1e-14)
    assert abs(float(ct) - float(cp)) < 1e-14


def test_step3_phased_capa_path():
    """step3_phased must slice the capacity function (and the per-cell
    dtdx = dt/(capa*dx)) correctly in its tile loop — ADVICE r4: the
    index_capa >= 0 slab slicing was untested.  euler_3D ignores aux, so
    a synthetic capacity row isolates exactly the capa dataflow."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.euler_3D
    rng = np.random.default_rng(5)
    n = 20
    q = np.ones((5, n, n, n))
    q[0] = 1.0 + 0.1 * rng.random((n, n, n))
    q[1:4] = 0.2 * rng.random((3, n, n, n))
    q[4] = 2.5 + 0.2 * rng.random((n, n, n))
    qj = jnp.asarray(q)
    aux = jnp.asarray(1.0 + 0.5 * rng.random((1, n, n, n)))
    args = (aux, 1e-3, 0.1, 0.1, 0.1, rp.rp, rp.rpt, rp.rptt, {"gamma": 1.4},
            (1,) * 5, 2, False, 0, 2)          # index_capa = 0
    qt, ct = kernels.step3_tiled(qj, *args, transverse_waves=2,
                                 tile_rows=4, prefactor=rp.prefactor)
    qp, cp = kernels.step3_phased(qj, *args, transverse_waves=2,
                                  tile_rows=(8, 4), prefactor=rp.prefactor)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qt), atol=1e-14)
    assert abs(float(ct) - float(cp)) < 1e-14


def test_step3_batched_transverse_bitwise():
    """solver.batch_transverse=True stacks all asdq splits per sweep
    direction; values must be bitwise the unbatched path's."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.euler_3D
    rng = np.random.default_rng(7)
    q = np.ones((5, 12, 12, 12))
    q[0] = 1.0 + 0.1 * rng.random((12, 12, 12))
    q[1:4] = 0.2 * rng.random((3, 12, 12, 12))
    q[4] = 2.5 + 0.2 * rng.random((12, 12, 12))
    qj = jnp.asarray(q)
    params = {"gamma": 1.4}
    args = (None, 1e-3, 0.1, 0.1, 0.1, rp.rp, rp.rpt, rp.rptt, params,
            (1,) * 5, 2, False, -1, 2)
    q0, c0 = kernels.step3(qj, *args, transverse_waves=2,
                           prefactor=rp.prefactor, batch_transverse=False)
    q1, c1 = kernels.step3(qj, *args, transverse_waves=2,
                           prefactor=rp.prefactor, batch_transverse=True)
    assert bool(jnp.all(q0 == q1)) and bool(c0 == c1)


def _sharpclaw_generic(tile):
    """Full SharpClaw step through the generic dq_nd path (char_decomp
    forces off the SoA fast path); the step wraps the tiled/monolithic
    dq_nd under test."""
    solver = pyclaw.SharpClawSolver2D(riemann.euler_4wave_2D)
    solver.all_bcs = pyclaw.BC.extrap
    solver.char_decomp = 2
    solver.soa_tile_rows = tile
    domain = pyclaw.Domain([-1.0, -1.0], [1.0, 1.0], [32, 24])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["gamma"] = 1.4
    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    state.q[0] = np.where(r < 0.5, 2.0, 1.0)
    state.q[1] = 0.0
    state.q[2] = 0.0
    state.q[3] = np.where(r < 0.5, 5.0, 2.5)
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    q, cfl = solver._step_fn(jnp.asarray(state.q), None, 1e-3, 0.0)
    return np.asarray(q), float(cfl)


def test_dq_nd_tiled_matches_monolithic():
    q_t, c_t = _sharpclaw_generic(8)
    q_u, c_u = _sharpclaw_generic(0)
    np.testing.assert_allclose(q_t, q_u, atol=1e-14)
    assert abs(c_t - c_u) < 1e-14


def _sharpclaw_3d(tile):
    solver = pyclaw.SharpClawSolver3D(riemann.euler_3D)
    solver.all_bcs = pyclaw.BC.extrap
    solver.time_integrator = "Euler"
    solver.soa_tile_rows = tile
    domain = pyclaw.Domain([-1.0] * 3, [1.0] * 3, [16, 16, 12])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data["gamma"] = 1.4
    x, y, z = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    state.q[0] = np.where(r < 0.5, 2.0, 1.0)
    state.q[1:4] = 0.0
    state.q[4] = np.where(r < 0.5, 5.0, 2.5)
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    q, cfl = solver._step_fn(jnp.asarray(state.q), None, 1e-3, 0.0)
    return np.asarray(q), float(cfl)


def test_dq_3d_two_axis_tiled_matches_monolithic():
    """3D SharpClaw (x, y)-tiled dq (round-3 VMEM blocking) ==
    monolithic, bit-exact."""
    q_t, c_t = _sharpclaw_3d(4)
    q_u, c_u = _sharpclaw_3d(0)
    np.testing.assert_allclose(q_t, q_u, atol=1e-14)
    assert abs(c_t - c_u) < 1e-14


def test_step3_roll_bitexact():
    """kernels.step3_roll (the Pallas 3D body) must reproduce step3
    bit-for-bit on the interior for every transverse mode."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.euler_3D
    rng = np.random.default_rng(3)
    n = 16
    q = np.ones((5, n, n, n))
    q[0] = 1.0 + 0.1 * rng.random((n, n, n))
    q[1:4] = 0.2 * rng.random((3, n, n, n))
    q[4] = 2.5 + 0.2 * rng.random((n, n, n))
    qj = jnp.asarray(q)
    params = {"gamma": 1.4}
    for tw in (0, 1, 2):
        a, ca = kernels.step3(qj, None, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                              rp.rpt, rp.rptt, params, (4,) * 3, 2,
                              False, -1, 2, transverse_waves=tw,
                              prefactor=rp.prefactor)
        b, cb = kernels.step3_roll(qj, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                   rp.rpt, rp.rptt, params, (4,) * 3, 2,
                                   2, transverse_waves=tw,
                                   prefactor=rp.prefactor)
        assert bool(jnp.all(a == b)) and float(ca) == float(cb)


def test_step3_pallas_xy_matches_tiled():
    """The (x,y)-tiled Pallas 3D kernel (interpret mode on CPU) vs the
    XLA tiled driver — multi-tile, full corner transport."""
    from pyclaw_tpu.classic import kernels
    from pyclaw_tpu.ops import tiled2d

    rp = riemann.euler_3D
    rng = np.random.default_rng(7)
    n = 16
    g = 2
    q = np.ones((5, n + 2 * g, n + 2 * g, n + 2 * g))
    q[0] = 1.0 + 0.1 * rng.random(q.shape[1:])
    q[1:4] = 0.1 * rng.random((3,) + q.shape[1:])
    q[4] = 2.5 + 0.1 * rng.random(q.shape[1:])
    qj = jnp.asarray(q)
    params = {"gamma": 1.4}
    a, ca = kernels.step3_tiled(qj, None, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                rp.rpt, rp.rptt, params, (4,) * 3, 2,
                                False, -1, g, transverse_waves=2,
                                tile_rows=4, prefactor=rp.prefactor)
    b, cb = tiled2d.step3_pallas_xy(qj, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                    rp.rpt, rp.rptt, params, (4,) * 3,
                                    2, g, transverse_waves=2,
                                    prefactor=rp.prefactor, tile=(8, 8))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-13)
    assert abs(float(ca) - float(cb)) < 1e-13


def test_step3_roll_aux_bitexact():
    """step3_roll with an aux array (3D heterogeneous acoustics, tw=1)
    must reproduce step3 bit-for-bit on the interior."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.vc_acoustics_3D
    rng = np.random.default_rng(11)
    n = 16
    q = jnp.asarray(0.1 * rng.random((4, n, n, n)))
    aux = jnp.asarray(1.0 + 0.2 * rng.random((2, n, n, n)))
    a, ca = kernels.step3(q, aux, 1e-3, 0.1, 0.1, 0.1, rp.rp, rp.rpt,
                          None, {}, (1,) * 2, 2, False, -1, 2,
                          transverse_waves=1)
    b, cb = kernels.step3_roll(q, 1e-3, 0.1, 0.1, 0.1, rp.rp, rp.rpt,
                               None, {}, (1,) * 2, 2, 2,
                               transverse_waves=1, aux=aux)
    assert bool(jnp.all(a == b)) and float(ca) == float(cb)


def test_step3_pallas_xy_aux_matches_tiled():
    """The aux-carrying 3D Pallas kernel (interpret mode on CPU) vs the
    XLA tiled driver — heterogeneous acoustics, multi-tile."""
    from pyclaw_tpu.classic import kernels
    from pyclaw_tpu.ops import tiled2d

    rp = riemann.vc_acoustics_3D
    rng = np.random.default_rng(12)
    n, g = 16, 2
    q = jnp.asarray(0.1 * rng.random((4, n + 2 * g, n + 2 * g,
                                      n + 2 * g)))
    aux = jnp.asarray(1.0 + 0.2 * rng.random((2, n + 2 * g, n + 2 * g,
                                              n + 2 * g)))
    a, ca = kernels.step3_tiled(q, aux, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                rp.rpt, None, {}, (1,) * 2, 2, False,
                                -1, g, transverse_waves=1, tile_rows=4)
    b, cb = tiled2d.step3_pallas_xy(q, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                    rp.rpt, None, {}, (1,) * 2, 2, g,
                                    transverse_waves=1, tile=(8, 8),
                                    auxbc=aux)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-13)
    assert abs(float(ca) - float(cb)) < 1e-13


def test_step3_roll_capa_bitexact():
    """step3_roll with a capacity function (per-cell dtdx in the
    normal, transverse and rptt coefficients — the flux3.f90 dtdx1d
    path) must reproduce step3 bit-for-bit on the interior."""
    from pyclaw_tpu.classic import kernels

    rp = riemann.euler_3D
    rng = np.random.default_rng(21)
    n = 16
    q = np.ones((5, n, n, n))
    q[0] = 1.0 + 0.1 * rng.random((n, n, n))
    q[1:4] = 0.1 * rng.random((3, n, n, n))
    q[4] = 2.5 + 0.2 * rng.random((n, n, n))
    qj = jnp.asarray(q)
    aux = jnp.asarray(1.0 + 0.5 * rng.random((1, n, n, n)))
    params = {"gamma": 1.4}
    for tw in (0, 1, 2):
        a, ca = kernels.step3(qj, aux, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                              rp.rpt, rp.rptt, params, (4,) * 3, 2,
                              False, 0, 2, transverse_waves=tw,
                              prefactor=rp.prefactor)
        b, cb = kernels.step3_roll(qj, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                   rp.rpt, rp.rptt, params, (4,) * 3, 2,
                                   2, transverse_waves=tw,
                                   prefactor=rp.prefactor, aux=aux,
                                   index_capa=0)
        assert bool(jnp.all(a == b)) and float(ca) == float(cb), tw


def test_step3_pallas_xy_capa_matches_tiled():
    """The capacity-carrying 3D Pallas kernel (interpret mode on CPU)
    vs the XLA tiled driver — euler + synthetic kappa, multi-tile (the
    dead-lane aux padding must stay outside interior/CFL windows)."""
    from pyclaw_tpu.classic import kernels
    from pyclaw_tpu.ops import tiled2d

    rp = riemann.euler_3D
    rng = np.random.default_rng(22)
    n, g = 16, 2
    q = np.ones((5, n + 2 * g, n + 2 * g, n + 2 * g))
    q[0] = 1.0 + 0.1 * rng.random(q.shape[1:])
    q[1:4] = 0.1 * rng.random((3,) + q.shape[1:])
    q[4] = 2.5 + 0.1 * rng.random(q.shape[1:])
    qj = jnp.asarray(q)
    aux = jnp.asarray(1.0 + 0.5 * rng.random((1,) + q.shape[1:]))
    params = {"gamma": 1.4}
    a, ca = kernels.step3_tiled(qj, aux, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                rp.rpt, rp.rptt, params, (4,) * 3, 2,
                                False, 0, g, transverse_waves=2,
                                tile_rows=4, prefactor=rp.prefactor)
    b, cb = tiled2d.step3_pallas_xy(qj, 1e-3, 0.1, 0.1, 0.1, rp.rp,
                                    rp.rpt, rp.rptt, params, (4,) * 3,
                                    2, g, transverse_waves=2,
                                    prefactor=rp.prefactor, tile=(8, 8),
                                    auxbc=aux, index_capa=0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-13)
    assert abs(float(ca) - float(cb)) < 1e-13


def test_step3_roll_fwave_bitexact():
    """step3_roll with fwave=True (f-wave correction-flux form) must
    reproduce step3 bit-for-bit; for constant advection the f-wave is
    Z = u W, so the result must also equal the wave-form run."""
    from pyclaw_tpu.classic import kernels

    base = riemann.advection_3D

    def rp_fwave(ixy, q_l, q_r, aux_l, aux_r, params):
        wave, s, amdq, apdq = base.rp(ixy, q_l, q_r, aux_l, aux_r,
                                      params)
        return wave * jnp.expand_dims(s, 0), s, amdq, apdq

    rng = np.random.default_rng(33)
    n = 16
    q = jnp.asarray(rng.random((1, n, n, n)))
    params = {"u": 1.0, "v": 0.5, "w": -0.7}
    for tw in (0, 2):
        a, ca = kernels.step3(q, None, 1e-3, 0.1, 0.1, 0.1, rp_fwave,
                              base.rpt, base.rptt, params, (4,), 2,
                              True, -1, 2, transverse_waves=tw)
        b, cb = kernels.step3_roll(q, 1e-3, 0.1, 0.1, 0.1, rp_fwave,
                                   base.rpt, base.rptt, params, (4,), 2,
                                   2, transverse_waves=tw, fwave=True)
        assert bool(jnp.all(a == b)) and float(ca) == float(cb), tw
        w, cw = kernels.step3(q, None, 1e-3, 0.1, 0.1, 0.1, base.rp,
                              base.rpt, base.rptt, params, (4,), 2,
                              False, -1, 2, transverse_waves=tw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(w),
                                   atol=1e-14)
