"""Source-term hooks: classic step_source (Godunov/Strang) and SharpClaw
dq_src, against the exact advection-reaction solution."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _exact(claw, lam=1.0):
    x = claw.solution.domain.grid.x.centers
    t = claw.solution.t
    xm = (x - 0.5 - t) % 1.0
    xm = np.minimum(xm, 1.0 - xm)
    return np.exp(-lam * t) * np.exp(-100.0 * xm ** 2)


@pytest.mark.parametrize("solver_type,split", [("classic", 1),
                                               ("classic", 2),
                                               ("sharpclaw", None)])
def test_advection_reaction(solver_type, split):
    from advection_reaction import setup
    kw = {} if split is None else {"source_split": split}
    claw = setup(nx=200, solver_type=solver_type, outdir=None, **kw)
    claw.run()
    err = np.max(np.abs(claw.solution.q[0] - _exact(claw)))
    # decay + advection commute -> splitting is exact; error is the pure
    # advection scheme error (~2% peak clipping at nx=200)
    assert err < 0.03, err
    # amplitude decay must match exp(-1) to high accuracy
    peak = claw.solution.q[0].max()
    assert abs(peak - np.exp(-1.0) * 1.0) < 0.02, peak
