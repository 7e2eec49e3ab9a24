"""SoA fast path vs generic AoS kernel: dual-path consistency oracle
(SURVEY.md §4).  The SoA step (classic/soa.py) must reproduce
kernels.step2 to roundoff for every transverse option, order, and
limiter mix, on random states."""

import numpy as np
import pytest

import jax.numpy as jnp

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def _random_state(solver, rng, n=(18, 14)):
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], list(n))
    state = pyclaw.State(domain, solver.rp.num_eqn)
    if solver.rp.num_eqn >= 4:          # euler: physical positive state
        state.problem_data["gamma"] = 1.4
        state.q[0] = 1.0 + 0.5 * rng.random(n)
        state.q[1] = 0.3 * rng.standard_normal(n)
        state.q[2] = 0.3 * rng.standard_normal(n)
        state.q[3] = 2.5 + rng.random(n)
        if solver.rp.num_eqn == 5:
            state.q[4] = state.q[0] * rng.random(n)
    else:                               # acoustics
        state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
        state.q[...] = rng.standard_normal(state.q.shape)
    return state, domain


def _one_step(rp_rec, use_soa, tw, order, limiters, seed=3, bc=None):
    solver = pyclaw.ClawSolver2D(rp_rec)
    solver.use_soa = use_soa
    solver.transverse_waves = tw
    solver.order = order
    solver.limiters = limiters
    solver.all_bcs = bc if bc is not None else pyclaw.BC.periodic
    rng = np.random.default_rng(seed)
    state, domain = _random_state(solver, rng)
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    q_new, cfl = solver._step_fn(jnp.asarray(state.q), None, 1e-3, 0.0)
    return np.asarray(q_new), float(cfl)


RP_CASES = [riemann.euler_4wave_2D, riemann.euler_5wave_2D,
            riemann.acoustics_2D]


@pytest.mark.parametrize("rp_rec", RP_CASES, ids=lambda r: r.name)
@pytest.mark.parametrize("tw", [0, 1, 2])
def test_soa_matches_generic(rp_rec, tw):
    lims = [4] if rp_rec.num_waves != 4 else [1, 3, 4, 2]  # mixed ids
    q_soa, c_soa = _one_step(rp_rec, True, tw, 2, lims)
    q_aos, c_aos = _one_step(rp_rec, False, tw, 2, lims)
    np.testing.assert_allclose(q_soa, q_aos, atol=1e-13)
    assert abs(c_soa - c_aos) < 1e-13


@pytest.mark.parametrize("order", [1, 2])
def test_soa_matches_generic_orders(order):
    q_soa, c_soa = _one_step(riemann.euler_4wave_2D, True, 2, order, [0])
    q_aos, c_aos = _one_step(riemann.euler_4wave_2D, False, 2, order, [0])
    np.testing.assert_allclose(q_soa, q_aos, atol=1e-13)
    assert abs(c_soa - c_aos) < 1e-13


def test_soa_matches_generic_cfl_limiter():
    """CFL-dependent limiter ids thread dtdx through the SoA path too."""
    lims = [tvd_id] if (tvd_id := 14) else None
    q_soa, _ = _one_step(riemann.euler_4wave_2D, True, 2, 2, lims)
    q_aos, _ = _one_step(riemann.euler_4wave_2D, False, 2, 2, lims)
    np.testing.assert_allclose(q_soa, q_aos, atol=1e-13)


def test_soa_is_default_for_eligible():
    solver = pyclaw.ClawSolver2D(riemann.euler_4wave_2D)
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [8, 8])
    state = pyclaw.State(domain, 4)
    assert solver._soa_eligible(state)
    solver.fwave = True
    assert not solver._soa_eligible(state)


@pytest.mark.parametrize("weno_order", [5, 7])
def test_sharpclaw_soa_matches_generic(weno_order):
    """SharpClaw SoA dq path (sharpclaw/soa.py) vs the generic dq_nd."""
    def one_step(use_soa):
        solver = pyclaw.SharpClawSolver2D(riemann.euler_4wave_2D)
        solver.use_soa = use_soa
        solver.weno_order = weno_order
        solver.all_bcs = pyclaw.BC.periodic
        rng = np.random.default_rng(9)
        state, domain = _random_state(solver, rng)
        sol = pyclaw.Solution(state, domain)
        solver.setup(sol)
        q_new, cfl = solver._step_fn(jnp.asarray(state.q), None, 1e-4, 0.0)
        return np.asarray(q_new), float(cfl)

    q_soa, c_soa = one_step(True)
    q_aos, c_aos = one_step(False)
    np.testing.assert_allclose(q_soa, q_aos, atol=1e-13)
    assert abs(c_soa - c_aos) < 1e-13


@pytest.mark.parametrize("tile", [4, 8, 16])
def test_soa_tiled_matches_monolithic(tile):
    """Row-tiled SoA driver (VMEM-blocked lax.map) vs monolithic step:
    bit-level agreement for every tile size that divides the grid, and
    clean fallback when it doesn't."""
    from pyclaw_tpu.classic import soa

    solver = pyclaw.ClawSolver2D(riemann.euler_4wave_2D)
    solver.all_bcs = pyclaw.BC.periodic
    rng = np.random.default_rng(11)
    state, domain = _random_state(solver, rng, n=(32, 20))
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    qbc = jnp.pad(jnp.asarray(state.q), ((0, 0), (2, 2), (2, 2)),
                  mode="wrap")
    args = (1e-3, 1.0 / 32, 1.0 / 20, solver.rp.rpn_soa,
            solver.rp.rpt_soa, dict(state.problem_data),
            solver._mthlim(), 2, 2)
    q_mono, c_mono = soa.step2_soa(qbc, *args)
    q_tile, c_tile = soa.step2_soa_tiled(qbc, *args, tile_rows=tile)
    np.testing.assert_allclose(np.asarray(q_tile), np.asarray(q_mono),
                               atol=1e-14)
    assert abs(float(c_tile) - float(c_mono)) < 1e-14


def test_soa_tiled_solver_attribute():
    """solver.soa_tile_rows drives the production step; a tiled and an
    untiled solver produce identical evolutions."""
    def run(tile):
        solver = pyclaw.ClawSolver2D(riemann.euler_4wave_2D)
        solver.all_bcs = pyclaw.BC.periodic
        solver.kernel_family = "soa"   # pin the family: this test is
        # about the tile attribute, and tiled-vs-monolithic is only
        # bitwise WITHIN a family
        solver.soa_tile_rows = tile
        rng = np.random.default_rng(5)
        state, domain = _random_state(solver, rng, n=(32, 20))
        sol = pyclaw.Solution(state, domain)
        solver.setup(sol)
        return solver._step_fn(jnp.asarray(state.q), None, 1e-3, 0.0)

    q_t, c_t = run(8)
    q_u, c_u = run(0)
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_u),
                               atol=1e-14)
    assert abs(float(c_t) - float(c_u)) < 1e-14


def test_sharpclaw_soa_tiled_matches_monolithic():
    from pyclaw_tpu.sharpclaw import soa as sc_soa

    solver = pyclaw.SharpClawSolver2D(riemann.euler_4wave_2D)
    solver.all_bcs = pyclaw.BC.periodic
    rng = np.random.default_rng(7)
    state, domain = _random_state(solver, rng, n=(32, 20))
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)
    g = solver.num_ghost
    qbc = jnp.pad(jnp.asarray(state.q), ((0, 0), (g, g), (g, g)),
                  mode="wrap")
    args = (1e-3, 1.0 / 32, 1.0 / 20, solver.rp.rpn_soa,
            dict(state.problem_data), solver.weno_order, g)
    d_mono, c_mono = sc_soa.dq_2d_soa(qbc, *args)
    d_tile, c_tile = sc_soa.dq_2d_soa_tiled(qbc, *args, tile_rows=8)
    np.testing.assert_allclose(np.asarray(d_tile), np.asarray(d_mono),
                               atol=1e-14)
    assert abs(float(c_tile) - float(c_mono)) < 1e-14
