"""Per-fusion time breakdown of a compiled step from an XProf trace
(round-5: VERDICT task 1 — aim the trace-and-rewrite method at the
headline paths).

Captures ``jax.profiler.trace`` around a fori_loop of the chosen
workload (same setups as tools/abbench.py), parses the .xplane.pb with
the TSL xplane protobuf, and aggregates device-plane op durations:

    python tools/trace_ops.py classic2d [mx=1024 nsteps=30] [top=25]

Prints total device time and the top-N ops by self-duration, with the
HLO op name and (when present in metadata) the source line — the
"name the dominant fusion" step that drove the round-4 3D rework.
"""

import glob
import json
import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))


def _build(workload, **kw):
    """Returns (step, q, dt, cells) for a named abbench workload."""
    import jax.numpy as jnp
    if workload == "classic2d":
        from euler_2d_quadrants import setup
        mx = kw.pop("mx", 1024)
        claw = setup(mx=mx, my=mx, solver_type="classic", outdir=None,
                     dtype="float32")
        for k, v in kw.items():
            setattr(claw.solver, k, v)
        claw.solver.setup(claw.solution)
        return (claw.solver._step_fn, jnp.asarray(claw.solution.state.q),
                0.2 / mx, mx * mx)
    if workload == "cfg4":
        from euler_2d_quadrants import setup
        mx = kw.pop("mx", 1024)
        integ = kw.pop("integrator", "SSP104")
        claw = setup(mx=mx, my=mx, solver_type="sharpclaw", outdir=None,
                     dtype="float32")
        claw.solver.time_integrator = integ
        for k, v in kw.items():
            setattr(claw.solver, k, v)
        claw.solver.setup(claw.solution)
        return (claw.solver._step_fn, jnp.asarray(claw.solution.state.q),
                0.02 / mx, mx * mx)
    if workload == "euler3d":
        import numpy as np
        import pyclaw_tpu as pyclaw
        from pyclaw_tpu import riemann
        n3 = kw.pop("n3", 192)
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
        return (solver._step_fn, jnp.asarray(state.q), 0.1 / n3, n3 ** 3)
    raise SystemExit(f"unknown workload {workload}")


def capture(workload, nsteps=30, tracedir=None, **kw):
    import jax
    import jax.numpy as jnp
    from jax import lax

    step, q, dt, cells = _build(workload, **kw)

    @jax.jit
    def run_n(q0, n):
        def body(i, carry):
            qc, cflmax = carry
            qn, cfl = step(qc, None, dt, 0.0)
            return qn, jnp.maximum(cflmax, cfl)
        return lax.fori_loop(0, n, body, (q0, jnp.zeros((), q.dtype)))

    out = run_n(q, 2)                       # compile + warm
    float(jnp.sum(out[0][0, ::64, ::64]))
    tracedir = tracedir or f"/tmp/trace_{workload}"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        out = run_n(q, nsteps)
        float(jnp.sum(out[0][0, ::64, ::64]) + out[1])
    return tracedir, cells, nsteps


def device_op_times(tracedir):
    """{op_name: (total_us, count, source)} summed over device planes."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {tracedir}")
    agg = defaultdict(lambda: [0.0, 0, ""])
    plane_names = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            plane_names.append(plane.name)
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
            ev_meta = {m.id: m for m in plane.event_metadata.values()}
            for line in plane.lines:
                # XLA op lines; skip step/annotation lines
                for ev in line.events:
                    meta = ev_meta.get(ev.metadata_id)
                    if meta is None:
                        continue
                    dur_us = ev.duration_ps / 1e6
                    src = ""
                    for st in ev.stats:
                        nm = stats_meta.get(st.metadata_id, "")
                        if nm in ("tf_op", "source", "source_info",
                                  "hlo_category"):
                            v = (st.str_value
                                 or stats_meta.get(st.ref_value, ""))
                            if v:
                                src = v if not src else f"{src} | {v}"
                    a = agg[(line.name, meta.name)]
                    a[0] += dur_us
                    a[1] += 1
                    if src and not a[2]:
                        a[2] = src
    return agg, plane_names


def _op_bytes(op_text):
    """Approximate (output_bytes, operand_bytes) of one HLO op from its
    rendered text: sum of f32[...] shape volumes on the lhs (incl. tuple
    elements) and rhs operand list.  Used for the fusion-boundary
    traffic accounting (every fusion's inputs/outputs live in VMEM via
    S(1) or HBM; either way they cross a memory port)."""
    import re
    lhs, _, rhs = op_text.partition(" fusion(")
    if not rhs:
        lhs, _, rhs = op_text.partition("(")

    def vol(txt):
        total = 0
        for m in re.finditer(r"(f32|s32|u32|pred)\[([\d,]*)\]", txt):
            v = 1
            for s in m.group(2).split(","):
                if s:
                    v *= int(s)
            total += v * (1 if m.group(1) == "pred" else 4)
        return total
    return vol(lhs.split(" = ")[-1] if " = " in lhs else lhs), vol(rhs)


def main():
    workload = sys.argv[1] if len(sys.argv) > 1 else "classic2d"
    kw = {}
    top = 25
    nsteps = 30
    for arg in sys.argv[2:]:
        k, v = arg.split("=")
        if k == "top":
            top = int(v)
        elif k == "nsteps":
            nsteps = int(v)
        else:
            try:
                kw[k] = int(v)
            except ValueError:
                kw[k] = v
    tracedir, cells, nsteps = capture(workload, nsteps=nsteps, **kw)
    agg, planes = device_op_times(tracedir)
    print("planes:", sorted(set(planes)))
    # leaf ops only: the outer step while / inner tile while / module
    # rows wrap everything and would double-count
    leaf = {k: v for k, v in agg.items()
            if " while(" not in k[1] and k[0] != "XLA Modules"}
    wraps = {k: v for k, v in agg.items() if " while(" in k[1]}
    rows = sorted(leaf.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for v in leaf.values())
    out_b = op_b = 0
    for (ln, op), (us, n, src) in leaf.items():
        ob, ib = _op_bytes(op)
        out_b += ob * n
        op_b += ib * n
    for (ln, op), (us, n, src) in wraps.items():
        print(f"[wrapper] x{n}: {us/1e3:.3f} ms total  "
              f"{op.split(' = ')[0]}")
    print(f"leaf device op time: {total/1e3:.3f} ms over {nsteps} steps; "
          f"{total*1e3/nsteps/cells:.3f} ns/cell/step")
    print(f"leaf op traffic: outputs {out_b/nsteps/1e6:.1f} MB/step "
          f"({out_b/nsteps/cells:.0f} B/cell), operands "
          f"{op_b/nsteps/1e6:.1f} MB/step ({op_b/nsteps/cells:.0f} B/cell); "
          f"implied r+w bandwidth {(out_b+op_b)/(total/1e6)/1e12:.2f} TB/s")
    for (line_name, op), (us, n, src) in rows[:top]:
        ob, ib = _op_bytes(op)
        name = op.split(" = ")[0].lstrip("%")
        shape = op.split(" = ")[1].split(" ")[0] if " = " in op else "?"
        print(f"{us/1e3:9.3f} ms {100*us/total:5.1f}% x{n:<5d} "
              f"{name:<34s} {shape[:40]:<42s} "
              f"out {ob/1e6:6.2f}MB in {ib/1e6:6.2f}MB "
              f"bw {(ob+ib)*n/(us/1e6)/1e12:5.2f}TB/s {src[:60]}")


if __name__ == "__main__":
    main()
