"""Roofline accounting for the hot steps (VERDICT r2 item 1).

Answers "what binds the classic 2D Euler step?" with numbers measured on
THIS chip rather than datasheet guesses:

  1. Flop/byte counts per cell from XLA cost analysis of the MONOLITHIC
     (untiled) step — the tiled production step wraps the same math in a
     lax.map whose body cost analysis counts only once, so the untiled
     graph is the honest per-cell accounting.
  2. Empirical VPU peak: a fused non-foldable FMA chain (x <- x*x + c,
     the Julia map — algebraic simplification cannot collapse it) on an
     HBM-resident array, iterations >> array passes so flops dominate.
  3. Empirical HBM stream bandwidth: a fori_loop of x <- x + 1 over a
     256 MB array (one read + one write of HBM per iteration).
  4. Achieved = step flops/s and bytes/s (timed production tiled step)
     vs the two ceilings.

All timings use the differencing methodology from bench.py: on this
tunneled device block_until_ready returns at enqueue and every readback
costs ~0.3-0.5 s, so we difference a long and short fully-executed chain
(forced by a scalar readback) to cancel the constant overhead.

Usage:  python tools/roofline.py [mx=1024 my=1024 nsteps=200]
Prints one JSON object; docs/performance.md quotes these numbers.
"""

import json
import sys
import time


def _diff_time(run_n, n0, n1, reps=4):
    """Best-of-reps differenced wall time between chains of n1 and n0
    iterations; run_n(n) must force completion via a host readback.
    Guarded against a non-positive difference (readback jitter through
    the tunnel can exceed a short chain): retries with more reps, then
    with a doubled long chain, and raises rather than returning garbage
    (a negative VPU 'peak' poisoned one round-4 roofline run)."""
    run_n(n0)                       # compile + warm
    for attempt in range(3):
        r = reps + 2 * attempt
        scale = 2 ** attempt
        n1_eff = n0 + (n1 - n0) * scale
        t_small = min(_one(run_n, n0) for _ in range(r))
        t_big = min(_one(run_n, n1_eff) for _ in range(r))
        if t_big - t_small > max(0.1 * t_big, 2e-3):
            return (t_big - t_small) / scale
    raise RuntimeError(
        f"differenced timing unstable (t_big={t_big:.4f}, "
        f"t_small={t_small:.4f}) — chip busy or chain too short")


def _one(run_n, n):
    t0 = time.perf_counter()
    run_n(n)
    return time.perf_counter() - t0


def vpu_peak(dtype="float32"):
    """Empirical fused-elementwise throughput: x <- x*x + c (2 flops,
    non-foldable) on an 8M array, 512 vs 2560 iterations differenced."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 8 * 1024 * 1024
    x0 = jnp.full((n,), 0.001, dtype=dtype)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def chain(x, k):
        def body(i, x):
            return x * x + 0.1
        return lax.fori_loop(0, k, body, x, unroll=16)

    def run_n(k):
        out = chain(x0, k)
        float(out[0])               # forces full execution

    # the chain must be LONG: at ~6 TF/s 2048 iterations is ~6 ms of
    # work, smaller than the tunnel's readback jitter — which produced
    # round-to-round "peaks" anywhere from 1.3 to 5.9 TF/s.  32768
    # differenced iterations ≈ 90 ms of pure FMA work.
    k0, k1 = 2048, 34816
    t = _diff_time(run_n, k0, k1)
    return 2.0 * n * (k1 - k0) / t


def _chain_rate(body, n=8 * 1024 * 1024, k0=512, k1=2560, dtype="float32"):
    """Iterations/s/element of a fori_loop of ``body`` over an n-array
    (differenced timing, best-of-3).  Building block for the per-op
    throughput microbenches."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from functools import partial

    x0 = jnp.full((n,), 0.001, dtype=dtype)

    @partial(jax.jit, static_argnums=1)
    def chain(x, k):
        return lax.fori_loop(0, k, lambda i, x: body(x), x, unroll=16)

    def run_n(k):
        out = chain(x0, k)
        float(out[0])

    t = _diff_time(run_n, k0, k1)
    return n * (k1 - k0) / t


def vpu_div_peak(dtype="float32"):
    """Empirical divide throughput (divides/s): chain x <- c/(x+d) minus
    the cost of the same chain without the divide (x <- x+d), so the
    reported rate is the NET per-divide cost in element-ops/s.  VERDICT
    r3 weak 3: the FMA-derived VPU peak undercounts divide/sqrt (they
    occupy multiple FMA slots); this measures the honest denominator."""
    import time  # noqa: F401  (symmetry with the other benches)
    n, k0, k1 = 8 * 1024 * 1024, 512, 12800
    t_div = n * (k1 - k0) / _chain_rate(lambda x: 0.7 / (x + 0.1),
                                        n, k0, k1, dtype)
    t_add = n * (k1 - k0) / _chain_rate(lambda x: x + 0.1,
                                        n, k0, k1, dtype)
    if t_div - t_add <= 0.1 * t_div:
        raise RuntimeError(
            f"divide microbench noise-dominated (t_div={t_div:.4f}, "
            f"t_add={t_add:.4f}); a clamped rate would silently inflate "
            "the op-weighted ceiling")
    return n * (k1 - k0) / (t_div - t_add)


def vpu_rsqrt_peak(dtype="float32"):
    """Empirical rsqrt throughput (rsqrts/s), net of the companion add —
    proxy for sqrt/rsqrt cost in the Roe-average/WENO-weight algebra."""
    import jax
    from jax import lax
    n, k0, k1 = 8 * 1024 * 1024, 512, 12800
    t_rs = n * (k1 - k0) / _chain_rate(lambda x: lax.rsqrt(x + 0.1),
                                       n, k0, k1, dtype)
    t_add = n * (k1 - k0) / _chain_rate(lambda x: x + 0.1,
                                        n, k0, k1, dtype)
    if t_rs - t_add <= 0.1 * t_rs:
        raise RuntimeError(
            f"rsqrt microbench noise-dominated (t_rs={t_rs:.4f}, "
            f"t_add={t_add:.4f})")
    return n * (k1 - k0) / (t_rs - t_add)


def op_mix(step, q, dt):
    """Per-opcode elementwise-op volumes of the COMPILED step (parsed
    from the backend's optimized HLO): the op-weighted ceiling needs to
    know how many of the counted flops are divides/sqrts.  Counts each
    instruction's output element count; fusion-duplicated producers are
    counted as the chip executes them."""
    import re
    import jax

    @jax.jit
    def one(qc):
        return step(qc, None, dt, 0.0)

    txt = one.lower(q).compile().as_text()
    ops = {}
    pat = re.compile(
        r'\s*(?:ROOT )?[%\w.\-]+ = \w+\[([\d,]*)\][^ ]* '
        r'(add|subtract|multiply|divide|sqrt|rsqrt|maximum|minimum|'
        r'abs|negate|select|compare|exponential|log|power)\(')
    for line in txt.splitlines():
        m = pat.match(line)
        if m:
            vol = 1
            for s in m.group(1).split(','):
                if s:
                    vol *= int(s)
            ops[m.group(2)] = ops.get(m.group(2), 0) + vol
    return ops


def hbm_stream(dtype="float32"):
    """Empirical HBM bandwidth: fori_loop of x <- x + 1 over 256 MB —
    the loop-carried array is read and written from HBM every iteration
    (cross-iteration fusion is impossible for a while-loop carry)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 64 * 1024 * 1024
    x0 = jnp.zeros((n,), dtype=dtype)

    @jax.jit
    def chain(x, k):
        return lax.fori_loop(0, k, lambda i, x: x + 1.0, x)

    def run_n(k):
        out = chain(x0, k)
        float(out[0])

    k0, k1 = 8, 264      # 256 differenced passes ~ 200 ms of traffic
    t = _diff_time(run_n, k0, k1)
    return 8.0 * n * (k1 - k0) / t


def step_cost(step, q, dt):
    """XLA cost analysis of one compiled step call (use on an UNTILED
    step: lax.map bodies are counted once, not trip-count times)."""
    import jax

    @jax.jit
    def one(qc):
        return step(qc, None, dt, 0.0)

    ca = one.lower(q).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca.get("flops", -1.0)),
            "bytes": float(ca.get("bytes accessed", -1.0))}


def measured_steps_per_sec(step, q, dt, nsteps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(q0, n):
        def body(i, carry):
            qc, cfl = carry
            qn, c = step(qc, None, dt, 0.0)
            return qn, jnp.maximum(cfl, c)
        return lax.fori_loop(0, n, body, (q0, jnp.zeros((), q.dtype)))

    def run_n(n):
        out, cfl = chain(q, n)
        float(jnp.sum(out[0, ::256, ::256])) + float(cfl)

    t = _diff_time(run_n, 20, 20 + nsteps)
    return nsteps / t


def _analyze(setup, solver_type, mx, my, dt_frac, nsteps, vpu, hbm,
             dtype="float32", div_rate=None, rsqrt_rate=None):
    import jax.numpy as jnp

    cells = mx * my
    # cost analysis on the monolithic (untiled) build of the same step.
    # XLA's cost analysis counts a while/fori body ONCE regardless of
    # trip count, so the SSP104 integrator's rolled stage loops would
    # undercount ~4x: the SharpClaw cost build uses the Euler integrator
    # (exactly one dq + update) and scales by the stage count below.
    stages = 1
    claw_u = setup(mx=mx, my=my, solver_type=solver_type, outdir=None,
                   dtype=dtype)
    claw_u.solver.soa_tile_rows = 0
    # pin the family the PRODUCTION (tiled) step uses: soa_tile_rows=0
    # alone now selects the SoA family (the honest 'auto' pick for a
    # monolithic build), which would cost-analyze the wrong kernel
    claw_u.solver.kernel_family = "aos"
    if solver_type == "sharpclaw":
        claw_u.solver.time_integrator = "Euler"
        stages = 10           # SSP(10,4): 10 dq evaluations per step
        # (5 + 4 in the rolled fori_loops + the final one,
        # sharpclaw/solver.py SSP104 branch)
    claw_u.solver.setup(claw_u.solution)
    q = jnp.asarray(claw_u.solution.state.q)
    dt = dt_frac / mx
    cost = step_cost(claw_u.solver._step_fn, q, dt)

    # timing on the production (tiled) build
    claw_t = setup(mx=mx, my=my, solver_type=solver_type, outdir=None,
                   dtype=dtype)
    claw_t.solver.setup(claw_t.solution)
    sps = measured_steps_per_sec(claw_t.solver._step_fn, q, dt, nsteps)

    step_flops = cost["flops"] * stages
    out = {
        "flops_per_cell": step_flops / cells,
        "bytes_per_cell_untiled_costmodel": cost["bytes"] * stages / cells,
        "cell_updates_per_sec": sps * cells,
        "achieved_flops_per_sec": sps * step_flops,
        "pct_of_vpu_roofline": 100.0 * sps * step_flops / vpu,
        "min_bytes_per_cell": 12 * q.shape[0] * q.dtype.itemsize // 4,
        "pct_of_hbm_roofline_at_min_traffic":
            100.0 * sps * 3 * q.size * q.dtype.itemsize / hbm,
    }
    if stages > 1:
        out["cost_model"] = (f"Euler-integrator dq cost x {stages} stages "
                             "(while bodies are counted once by XLA)")

    # op-weighted ceiling (VERDICT r3 weak 3): divides/sqrts occupy
    # multiple FMA slots, so the FMA-only denominator overstates the
    # honest ceiling for divide-heavy kernels (cfg4 WENO weights, Roe
    # averages).  t_cell = fma_flops/vpu + n_div/div + n_sqrt/rsqrt.
    if div_rate and rsqrt_rate:
        mix = op_mix(claw_u.solver._step_fn, q, dt)
        n_div = mix.get("divide", 0) * stages / cells
        n_sqrt = (mix.get("sqrt", 0) + mix.get("rsqrt", 0)
                  + mix.get("power", 0)) * stages / cells
        fma = max(step_flops / cells - n_div - n_sqrt, 0.0)
        t_cell = fma / vpu + n_div / div_rate + n_sqrt / rsqrt_rate
        out["div_per_cell"] = n_div
        out["sqrt_rsqrt_per_cell"] = n_sqrt
        out["weighted_ceiling_cups"] = 1.0 / t_cell
        out["pct_of_weighted_ceiling"] = 100.0 * sps * cells * t_cell
    return out


def main(mx=1024, my=1024, nsteps=200, sc=1):
    import jax

    sys.path.insert(0, "examples")
    from euler_2d_quadrants import setup

    out = {"device": str(jax.devices()[0])}
    out["vpu_flops_per_sec"] = vpu_peak()
    out["hbm_bytes_per_sec"] = hbm_stream()
    out["vpu_div_per_sec"] = vpu_div_peak()
    out["vpu_rsqrt_per_sec"] = vpu_rsqrt_peak()

    out["classic"] = _analyze(setup, "classic", mx, my, 0.2, nsteps,
                              out["vpu_flops_per_sec"],
                              out["hbm_bytes_per_sec"],
                              div_rate=out["vpu_div_per_sec"],
                              rsqrt_rate=out["vpu_rsqrt_per_sec"])
    if sc:
        out["sharpclaw_ssp104"] = _analyze(
            setup, "sharpclaw", mx, my, 0.1, max(20, nsteps // 5),
            out["vpu_flops_per_sec"], out["hbm_bytes_per_sec"],
            div_rate=out["vpu_div_per_sec"],
            rsqrt_rate=out["vpu_rsqrt_per_sec"])

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
