"""Distributed shard IO round-trip (petclaw/fileio/petsc.py seam)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import parallel, riemann  # noqa: E402
from pyclaw_tpu.parallel import io as pio  # noqa: E402


def test_sharded_roundtrip(tmp_path):
    solver = parallel.ClawSolver2D(riemann.acoustics_2D)
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [32, 32])
    state = pyclaw.State(domain, 3)
    state.problem_data.update(rho=1.0, bulk=1.0)
    rng = np.random.default_rng(2)
    state.q[...] = rng.standard_normal(state.q.shape)
    state.t = 0.375
    sol = pyclaw.Solution(state, domain)
    solver.setup(sol)

    # run one step so _q_dev is the sharded jit output
    solver._push(state)
    q_dev, cfl = solver._step_fn(solver._q_dev, None, 0.001, 0.0)
    assert len(q_dev.addressable_shards) == len(jax.devices())

    index = pio.write_sharded(q_dev, state, 7, str(tmp_path))
    assert len(index["shards"]) == len(jax.devices())

    q_back, meta = pio.read_sharded(7, str(tmp_path))
    np.testing.assert_allclose(q_back, np.asarray(q_dev), atol=1e-15)
    assert abs(meta["t"] - 0.375) < 1e-12
    assert meta["num_cells"] == [32, 32]
