"""Weak-scaling measurement harness (BASELINE.json: cell-updates/s at
1 chip -> 1 host -> N hosts; reference analog: the PetClaw SISC-2012
scaling study).

Fixes the per-device subgrid size and grows the mesh; reports
cell-updates/s and parallel efficiency vs the 1-device run.

    python tools/weak_scaling.py                 # real backend, 1 device
    python tools/weak_scaling.py devices=8 cpu=1 # 8 virtual CPU devices
    python tools/weak_scaling.py distributed=1   # N hosts: run the SAME
        command on every host of the slice (init_distributed autodetects
        TPU pod topology; or set JAX_COORDINATOR_ADDRESS).  One row over
        all global devices; process 0 prints.

On this dev machine only 1 TPU chip exists, so multi-device rows run on
virtual CPU devices (communication-pattern validation, not a perf
claim); on a pod slice the same script measures the real thing.

Timing methodology depends on the backend (VERDICT r3 weak 1):
- tunneled TPU: long-minus-short differencing of chained dispatches with
  a final readback, so the constant per-readback RPC overhead cancels
  (same methodology as bench.py); guarded against a non-positive
  difference by doubling the step count and, failing that, erroring.
- CPU / distributed: readback is cheap and per-step cost is dominated by
  the collectives being measured — differencing two noisy runs can go
  NEGATIVE, so the chain is timed directly (>= 20 steps, best of 3; a
  fixed repeat count keeps every process executing the same collective
  sequence, avoiding cross-process deadlock).
"""

import json
import sys
import time


def main(local=512, nsteps=20, devices=None, cpu=0, distributed=0):
    import os
    if cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={devices or 8}")
        # must precede backend init (incl. jax.distributed.initialize):
        # on tunneled dev boxes the TPU plugin otherwise wins
        import jax
        jax.config.update("jax_platforms", "cpu")

    if distributed:
        # must precede any other JAX usage
        from pyclaw_tpu.parallel import init_distributed
        init_distributed()

    import jax
    import jax.numpy as jnp

    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import parallel, riemann
    from pyclaw_tpu.parallel.mesh import make_mesh

    ndev_avail = len(jax.devices())
    main_proc = jax.process_index() == 0
    if distributed:
        counts = [ndev_avail]        # one row: the whole slice
    else:
        counts = []
        n = 1
        while n <= (devices or ndev_avail):
            counts.append(n)
            n *= 2

    results = []
    base_cups = None
    for ndev in counts:
        mesh = make_mesh(2, devices=jax.devices()[:ndev])
        sx, sy = mesh.devices.shape
        mx, my = local * sx, local * sy
        solver = parallel.ClawSolver2D(riemann.euler_4wave_2D, mesh=mesh)
        solver.all_bcs = pyclaw.BC.extrap
        domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [mx, my])
        state = pyclaw.State(domain, 4, dtype="float32" if not cpu
                             else "float64")
        state.problem_data["gamma"] = 1.4
        state.q[0] = 1.0
        state.q[3] = 2.5
        solver.setup(pyclaw.Solution(state, domain))

        q = jnp.asarray(state.q)
        dt = 0.2 / mx
        step = solver._step_fn

        def timed(k, repeats=2):
            best = float("inf")
            for _ in range(repeats):
                qq = q
                t0 = time.perf_counter()
                for _ in range(k):
                    qq, cfl = step(qq, None, dt, 0.0)
                float(jnp.max(jnp.abs(qq[0, ::256, ::256]))) + float(cfl)
                best = min(best, time.perf_counter() - t0)
            return best

        timed(2, repeats=1)           # compile + warm caches
        # differencing only on single-process tunneled-TPU runs: in a
        # distributed run the retry loop below is data-dependent per
        # host and would desynchronize the collective sequences
        tunneled = ((not cpu) and (not distributed)
                    and jax.devices()[0].platform == "tpu")
        if tunneled:
            # differencing cancels the tunnel's constant readback RPC
            meas_steps, el = nsteps, -1.0
            while el <= 0.0 and meas_steps <= 16 * nsteps:
                el = timed(meas_steps + 5) - timed(5)
                if el <= 0.0:
                    meas_steps *= 2   # noise-dominated: lengthen the run
            if el <= 0.0:
                raise RuntimeError(
                    "weak_scaling: differenced timing non-positive even at "
                    f"{meas_steps // 2} steps — measurement noise exceeds "
                    "the step cost; raise nsteps")
        else:
            # direct timing; fixed repeat count so all processes run the
            # same collective sequence (no data-dependent loop bounds)
            meas_steps = max(nsteps, 20)
            el = timed(meas_steps, repeats=3)
        cups = mx * my * meas_steps / el
        row = {"devices": ndev,
               "hosts": jax.process_count(),
               "grid": [mx, my],
               "cell_updates_per_sec": round(cups, 1)}
        if distributed:
            # single whole-slice row: efficiency needs an external
            # 1-device baseline (run without distributed=1 to get one)
            row["note"] = "efficiency = cups / (1dev_cups * devices)"
        else:
            if base_cups is None:
                base_cups = cups
            row["efficiency_vs_1dev"] = round(cups / (base_cups * ndev), 4)
        results.append(row)
        if main_proc:
            print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
