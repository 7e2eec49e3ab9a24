"""Benchmark: cell-updates/sec/chip on 2D Euler quadrants (BASELINE.json
primary metric; float32, real device).  Measures BOTH algorithm families:

  - classic CTU (order 2, transverse_waves=2)  -> headline metric
  - SharpClaw WENO5 + SSP104 (BASELINE cfg4)   -> detail.sharpclaw

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


def _measure(step, q, dt, nsteps, n0=20):
    """Time the traced on-device evolve loop (lax.fori_loop -> ONE
    dispatch).  Per-call dispatch through the tunneled dev chip costs
    ~6 ms RPC + ~0.3 s readback; timing per-step python dispatches
    measures the tunnel, not the chip (validated 2026-08-18:
    block_until_ready on a short chain returns at enqueue).  Differencing
    a long and a short run cancels the constant RPC/readback overhead.

    The CFL reduction is carried through the loop and consumed by the
    final readback so XLA cannot dead-code-eliminate it — the production
    traced evolve loop always pays it."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run_n(q0, n):
        def body(i, carry):
            qc, cflmax = carry
            qn, cfl = step(qc, None, dt, 0.0)
            return qn, jnp.maximum(cflmax, cfl)
        return lax.fori_loop(0, n, body, (q0, jnp.zeros((), q.dtype)))

    def timed(n):
        best = float("inf")
        cfl = None
        for rep in range(3):
            t0 = time.perf_counter()
            out, cflmax = run_n(q, n)
            # forces completion of the whole chain incl. the reduction
            s = float(jnp.sum(out[0, ::256, ::256])) + float(cflmax)
            best = min(best, time.perf_counter() - t0)
        return best, s

    timed(n0)                        # compile + warm caches
    # guarded differencing (CLAUDE.md: the tunnel's readback jitter is
    # ~10-30 ms and occasional outliers are larger — a warm-cache run
    # once returned a NEGATIVE difference): every bench workload's true
    # differenced time is >= 0.1 s, so anything under 50 ms is jitter —
    # retry with fresh timings rather than report garbage
    for attempt in range(4):
        t_small, _ = timed(n0)
        t_big, s_big = timed(n0 + nsteps)
        elapsed = t_big - t_small
        if elapsed > 0.05:
            return elapsed, bool(np.isfinite(s_big))
    raise RuntimeError(
        f"differenced timing stayed under 50 ms across retries "
        f"(last={elapsed:.4f}s) — readback jitter dominated")


def main(mx=1024, my=1024, nsteps=300, dtype="float32", sc_steps=60):
    import jax

    # persistent compile cache: compiles through the tunnel cost
    # 20-40 s per program, and the driver runs bench.py under a fixed
    # timeout; the cache (verified working through the axon remote
    # compiler, round 5) makes repeat runs compile-free
    try:
        import os
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    t_start = time.monotonic()

    sys.path.insert(0, "examples")
    from euler_2d_quadrants import setup

    cells = mx * my

    # ---- classic CTU (headline) ---------------------------------------
    # backend='pallas' (the round-5 fused on-chip sweep, ~2x the XLA
    # driver) with automatic fallback to the XLA path if the tunnel's
    # Mosaic compiler regresses again (rounds 3-4 it was broken)
    dt = 0.2 * (1.0 / mx)  # fixed stable dt (CFL ~0.5 for this IC)
    cups = None
    for backend in ("pallas", "xla"):
        try:
            claw = setup(mx=mx, my=my, solver_type="classic",
                         outdir=None, dtype=dtype,
                         kernel_language=backend)
            solver = claw.solver
            solver.setup(claw.solution)
            q = jnp.asarray(claw.solution.state.q)
            elapsed, compile_ok = _measure(solver._step_fn, q, dt, nsteps)
            if not compile_ok:
                raise RuntimeError("non-finite result")
            cups = cells * nsteps / elapsed
            headline_backend = backend
            break
        except Exception as e:
            headline_err = repr(e)[:200]
    if cups is None:
        raise SystemExit(f"both backends failed: {headline_err}")

    # ---- SharpClaw WENO5 + SSP104 (BASELINE cfg4; the reference's
    # default integrator) plus SSP33 (cfg4's literal "SSP-RK3") --------
    sc = {}
    try:
        for backend2 in ("pallas", "xla"):
            try:
                claw2 = setup(mx=mx, my=my, solver_type="sharpclaw",
                              outdir=None, dtype=dtype,
                              kernel_language=backend2)
                solver2 = claw2.solver
                solver2.setup(claw2.solution)
                q2 = jnp.asarray(claw2.solution.state.q)
                dt2 = 0.1 * (1.0 / mx)
                el2, ok2 = _measure(solver2._step_fn, q2, dt2, sc_steps)
                if not ok2:
                    raise RuntimeError("non-finite result")
                sc = {
                    "cell_updates_per_sec":
                        round(cells * sc_steps / el2, 1),
                    "nsteps": sc_steps,
                    "elapsed_s": round(el2, 4),
                    "compile_finite": ok2,
                    "kernel_backend": backend2,
                }
                break
            except Exception as e2:
                sc = {"error": repr(e2)[:200]}
        claw3 = setup(mx=mx, my=my, solver_type="sharpclaw", outdir=None,
                      dtype=dtype,
                      kernel_language=sc.get("kernel_backend", "xla"))
        claw3.solver.time_integrator = "SSP33"
        claw3.solver.setup(claw3.solution)
        q33 = jnp.asarray(claw3.solution.state.q)
        el33, ok33 = _measure(claw3.solver._step_fn, q33,
                              0.02 * (1.0 / mx), sc_steps)
        sc["ssp33_cell_updates_per_sec"] = round(cells * sc_steps / el33, 1)
        sc["ssp33_compile_finite"] = ok33
    except Exception as e:  # never let cfg4 sink the headline metric
        sc = {"error": repr(e)}

    # ---- classic 3D Euler (192^3, full corner transport) ---------------
    e3d = {}
    try:
        import pyclaw_tpu as pyclaw
        from pyclaw_tpu import riemann

        n3 = 192
        import numpy as _np
        for backend3 in ("pallas", "xla"):
            try:
                solver3 = pyclaw.ClawSolver3D(riemann.euler_3D)
                solver3.backend = backend3
                solver3.all_bcs = pyclaw.BC.periodic
                domain3 = pyclaw.Domain([0.0] * 3, [1.0] * 3, [n3] * 3)
                state3 = pyclaw.State(domain3, 5, dtype=dtype)
                state3.problem_data["gamma"] = 1.4
                xs = domain3.grid.x.centers.reshape(-1, 1, 1)
                state3.q[0] = 1.0 + 0.2 * _np.sin(2 * _np.pi * xs)
                state3.q[1] = 0.1
                state3.q[4] = 2.5
                solver3.setup(pyclaw.Solution(state3, domain3))
                q3 = jnp.asarray(state3.q)
                el3, ok3 = _measure(solver3._step_fn, q3, 0.1 / n3, 20,
                                    n0=4)
                if not ok3:
                    raise RuntimeError("non-finite result")
                e3d = {"cell_updates_per_sec":
                       round(n3 ** 3 * 20 / el3, 1),
                       "grid": [n3] * 3, "nsteps": 20,
                       "compile_finite": ok3,
                       "kernel_backend": backend3}
                break
            except Exception as e3:
                e3d = {"error": repr(e3)[:200]}
    except Exception as e:  # never sink the headline
        e3d = {"error": repr(e)}

    # ---- grid sweep (VERDICT r4 item 4: verify the tiling story off
    # the tuned point; nsteps scaled so each adds ~1 measured second) --
    sweep = {}
    for smx, sn in ((2048, 80), (4096, 20)):
        try:
            claws = setup(mx=smx, my=smx, solver_type="classic",
                          outdir=None, dtype=dtype,
                          kernel_language=headline_backend)
            claws.solver.setup(claws.solution)
            qs2 = jnp.asarray(claws.solution.state.q)
            els, oks = _measure(claws.solver._step_fn, qs2,
                                0.2 / smx, sn, n0=4)
            sweep[f"{smx}x{smx}"] = {
                "cell_updates_per_sec": round(smx * smx * sn / els, 1),
                "nsteps": sn, "compile_finite": oks}
        except Exception as e:
            sweep[f"{smx}x{smx}"] = {"error": repr(e)[:150]}

    # ---- on-device f32 golden validation (correctness, not speed) ------
    # time-budgeted FROM BENCH START: the driver runs bench.py under a
    # fixed ~600 s timeout, the benches above already spent part of it
    # (cold compiles: ~20-40 s per program), and being killed here would
    # lose the headline JSON line entirely.  Cases past the remaining
    # budget are reported skipped instead.
    golden = {}
    try:
        sys.path.insert(0, "tools")
        from tpu_validate import validate
        budget = 450.0 - (time.monotonic() - t_start)
        if budget <= 0:
            golden = {"skipped": "bench time budget spent before "
                      "validation (cold compile caches?)"}
        else:
            res = validate(deadline_s=budget)
            ran = [r for r in res.values() if r.get("ok") is not None]
            # all_ok: True/False over the cases that RAN; None when the
            # time budget skipped everything (no correctness claim
            # either way — distinguish from a measured failure)
            golden = {"all_ok": (all(r.get("ok") for r in ran)
                                 if ran else None),
                      "ran": len(ran), "skipped": len(res) - len(ran),
                      "cases": res}
    except Exception as e:  # never sink the headline
        golden = {"error": repr(e)}

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
            "kernel_backend": headline_backend,
            "device": str(jax.devices()[0]),
            "compile_finite": compile_ok,
            "grid_sweep": sweep,
            "sharpclaw_weno5_ssp104": sc,
            "classic_3d_euler": e3d,
            "golden_ok": golden,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kwargs[k] = int(v) if v.isdigit() else v
    main(**kwargs)
