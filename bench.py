"""Benchmark: cell-updates/sec/chip on 2D Euler quadrants (BASELINE.json
primary metric; classic CTU solver, float32, real device).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cell_updates/s", "vs_baseline": N}

vs_baseline convention: the reference publishes no numbers (BASELINE.md);
we normalize against 1e7 cell-updates/s — a representative single-CPU-core
Fortran Clawpack throughput for classic 2D Euler (order of magnitude from
the SISC 2012 / ManyClaw papers).  vs_baseline = value / 1e7.
"""

import json
import sys
import time

import numpy as np

BASELINE_CELLS_PER_SEC = 1.0e7


def main(mx=1024, my=1024, nsteps=300, dtype="float32"):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "examples")
    from euler_2d_quadrants import setup

    claw = setup(mx=mx, my=my, solver_type="classic", outdir=None,
                 dtype=dtype)
    solver = claw.solver
    state = claw.solution.state
    solver.setup(claw.solution)

    q = jnp.asarray(state.q)
    aux = None
    dt = 0.2 * (1.0 / mx)  # fixed stable dt (CFL ~0.5 for this IC)
    step = solver._step_fn

    # warmup / compile (no host transfers before timing: the tunneled dev
    # chip pays a huge one-time cost on the first device->host transfer)
    qq = q
    for i in range(20):
        qq, cfl = step(qq, aux, dt, 0.0)
    qq.block_until_ready()

    # steady-state timing: chain steps on device, sync once at the end
    t0 = time.perf_counter()
    qq = q
    for i in range(nsteps):
        qq, cfl = step(qq, aux, dt, 0.0)
    qq.block_until_ready()
    elapsed = time.perf_counter() - t0

    compile_ok = bool(np.isfinite(float(cfl)))  # one transfer, after timing
    cells = mx * my
    cups = cells * nsteps / elapsed
    result = {
        "metric": "cell_updates_per_sec_per_chip_2d_euler_classic",
        "value": round(cups, 1),
        "unit": "cell_updates/s",
        "vs_baseline": round(cups / BASELINE_CELLS_PER_SEC, 3),
        "detail": {
            "grid": [mx, my],
            "nsteps": nsteps,
            "dtype": str(dtype),
            "elapsed_s": round(elapsed, 4),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "compile_finite": compile_ok,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kwargs[k] = int(v) if v.isdigit() else v
    main(**kwargs)
