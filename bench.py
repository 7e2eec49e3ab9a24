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
    dt = 0.2 * (1.0 / mx)  # fixed stable dt (CFL ~0.5 for this IC)
    step = solver._step_fn

    # Measure the PRODUCT execution model: the traced on-device evolve
    # loop (lax.fori_loop -> ONE dispatch for the whole run).  Per-call
    # dispatch through the tunneled dev chip costs ~6 ms RPC + ~0.3 s for
    # the result readback; timing per-step python dispatches measures the
    # tunnel, not the chip (validated 2026-08-18: block_until_ready on a
    # short chain returns at enqueue).  Differencing a long and a short
    # run cancels the constant RPC/readback overhead exactly.
    from jax import lax

    @jax.jit
    def run_n(q0, n):
        def body(i, qc):
            qn, cfl = step(qc, None, dt, 0.0)
            return qn
        return lax.fori_loop(0, n, body, q0)

    def timed(n):
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            out = run_n(q, n)
            s = float(jnp.sum(out[0, ::256, ::256]))  # forces completion
            best = min(best, time.perf_counter() - t0)
        return best, s

    n0 = 20
    timed(n0)                        # compile + warm caches
    t_small, _ = timed(n0)
    t_big, s_big = timed(n0 + nsteps)
    elapsed = t_big - t_small

    compile_ok = bool(np.isfinite(s_big))
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
