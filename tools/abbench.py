"""Quick same-day A/B measurement helper (round-5 perf work).

Measures one of the bench.py workloads in isolation so kernel rewrites
can be compared without paying the full bench:

    python tools/abbench.py classic2d [mx=1024 nsteps=300]
    python tools/abbench.py cfg4      [mx=1024 nsteps=60 integrator=SSP104]
    python tools/abbench.py euler3d   [n3=192 nsteps=20]

Prints one JSON line {workload, cups, elapsed_s}.  Methodology is
bench.py's differenced fori_loop chain (see bench._measure) — the only
valid timing on this tunneled device.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

from bench import _measure  # noqa: E402


def classic2d(mx=1024, nsteps=300, **kw):
    import jax.numpy as jnp
    from euler_2d_quadrants import setup
    claw = setup(mx=mx, my=mx, solver_type="classic", outdir=None,
                 dtype="float32")
    for k, v in kw.items():
        setattr(claw.solver, k, v)
    claw.solver.setup(claw.solution)
    q = jnp.asarray(claw.solution.state.q)
    el, ok = _measure(claw.solver._step_fn, q, 0.2 / mx, nsteps)
    assert ok
    return mx * mx * nsteps / el, el


def cfg4(mx=1024, nsteps=60, integrator="SSP104", **kw):
    import jax.numpy as jnp
    from euler_2d_quadrants import setup
    claw = setup(mx=mx, my=mx, solver_type="sharpclaw", outdir=None,
                 dtype="float32")
    claw.solver.time_integrator = integrator
    for k, v in kw.items():
        setattr(claw.solver, k, v)
    claw.solver.setup(claw.solution)
    q = jnp.asarray(claw.solution.state.q)
    el, ok = _measure(claw.solver._step_fn, q, 0.02 / mx, nsteps)
    assert ok
    return mx * mx * nsteps / el, el


def euler3d(n3=192, nsteps=20, **kw):
    import numpy as np
    import jax.numpy as jnp
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann
    solver = pyclaw.ClawSolver3D(riemann.euler_3D)
    solver.all_bcs = pyclaw.BC.periodic
    for k, v in kw.items():
        setattr(solver, k, v)
    domain = pyclaw.Domain([0.0] * 3, [1.0] * 3, [n3] * 3)
    state = pyclaw.State(domain, 5, dtype="float32")
    state.problem_data["gamma"] = 1.4
    xs = domain.grid.x.centers.reshape(-1, 1, 1)
    state.q[0] = 1.0 + 0.2 * np.sin(2 * np.pi * xs)
    state.q[1] = 0.1
    state.q[4] = 2.5
    solver.setup(pyclaw.Solution(state, domain))
    q3 = jnp.asarray(state.q)
    el, ok = _measure(solver._step_fn, q3, 0.1 / n3, nsteps, n0=4)
    assert ok
    return n3 ** 3 * nsteps / el, el


def main():
    workload = sys.argv[1]
    kw = {}
    for arg in sys.argv[2:]:
        k, v = arg.split("=")
        try:
            kw[k] = int(v)
        except ValueError:
            kw[k] = v
    cups, el = globals()[workload](**kw)
    print(json.dumps({"workload": workload, "cups": round(cups, 1),
                      "elapsed_s": round(el, 4), **kw}))


if __name__ == "__main__":
    main()
