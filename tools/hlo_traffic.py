"""Dump the optimized-HLO traffic profile of the classic 2D Euler step.

Compiles the bench step for the real TPU and reports, per opcode, the
total bytes of output buffers — a proxy for HBM write traffic of
non-fused ops (pads/copies/concats that XLA failed to fuse are pure
memory movement).  Usage:  python tools/hlo_traffic.py [mx=1024]
"""

import re
import sys
from collections import defaultdict

import numpy as np

_DT_BYTES = {"f32": 4, "f64": 8, "pred": 1, "s32": 4, "u32": 4}
_OP_PAT = re.compile(r"= ([a-z0-9]+)\[([0-9,]*)\](\{[^}]*\})? ([a-z\-]+)\(")


def entry_output_bytes(compiled_text, hbm_only=False):
    """Total output-buffer bytes of ENTRY-computation ops in optimized
    HLO — the materialization-traffic proxy used by the CI regression
    guard (tests/test_hlo_traffic.py).  Fusion bodies stay on-chip; only
    entry ops allocate buffers.  With hbm_only=True, buffers whose
    layout carries the alternate memory space S(1) (VMEM) are skipped
    (TPU compilations only)."""
    txt = (compiled_text[compiled_text.index("ENTRY "):]
           if "ENTRY " in compiled_text else compiled_text)
    total = 0
    for m in _OP_PAT.finditer(txt):
        dty, shape, layout, _op = m.groups()
        if dty not in _DT_BYTES:
            continue
        if hbm_only and layout and "S(1)" in layout:
            continue
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        total += n * _DT_BYTES[dty]
    return total


def main(mx=1024, my=1024, dtype="float32", solver_type="classic"):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "examples")
    from euler_2d_quadrants import setup

    claw = setup(mx=mx, my=my, solver_type=solver_type, outdir=None,
                 dtype=dtype)
    solver = claw.solver
    solver.setup(claw.solution)
    q = jnp.asarray(claw.solution.state.q)
    dt = 0.2 / mx

    step = jax.jit(solver._step_fn)
    lowered = step.lower(q, None, dt, 0.0)
    compiled = lowered.compile()
    full = compiled.as_text()
    # only ENTRY-computation ops touch HBM (fusion bodies are on-chip)
    entry = full[full.index("ENTRY "):] if "ENTRY " in full else full
    txt = entry

    dt_bytes = {"f32": 4, "f64": 8, "pred": 1, "s32": 4, "u32": 4}
    op_bytes = defaultdict(int)
    op_count = defaultdict(int)
    hbm_bytes = defaultdict(int)
    hbm_count = defaultdict(int)
    # lines like:  %pad.5 = f32[4,4,1023,1024]{2,1,0:T(8,128)S(1)} pad(...)
    # S(1) in the layout = alternate memory space (VMEM) — those outputs
    # never touch HBM; only space-0 buffers count toward HBM write traffic.
    pat = re.compile(r"= ([a-z0-9]+)\[([0-9,]*)\](\{[^}]*\})? ([a-z\-]+)\(")
    for m in pat.finditer(txt):
        dty, shape, layout, op = m.groups()
        if dty not in dt_bytes:
            continue
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        b = n * dt_bytes[dty]
        op_bytes[op] += b
        op_count[op] += 1
        if not (layout and "S(1)" in layout):
            hbm_bytes[op] += b
            hbm_count[op] += 1

    total = sum(op_bytes.values())
    hbm_total = sum(hbm_bytes.values())
    print(f"-- output-buffer bytes by opcode (step @ {mx}x{my} {dtype}) --")
    print(f"{'opcode':20s} {'all':>10s}        {'HBM-only':>10s}")
    for op in sorted(op_bytes, key=op_bytes.get, reverse=True)[:15]:
        print(f"{op:20s} {op_bytes[op]/1e9:8.3f} GB x{op_count[op]:<4d} "
              f"{hbm_bytes[op]/1e9:8.3f} GB x{hbm_count[op]}")
    print(f"{'TOTAL':20s} {total/1e9:8.3f} GB       {hbm_total/1e9:8.3f} GB")
    try:
        ma = compiled.memory_analysis()
        print("peak HBM (bytes):", ma.temp_size_in_bytes,
              "args:", ma.argument_size_in_bytes,
              "out:", ma.output_size_in_bytes)
    except Exception as e:
        print("memory_analysis unavailable:", e)

    # biggest single tensors
    big = sorted(
        ((np.prod([int(s) for s in m.group(2).split(",") if s]) *
          dt_bytes.get(m.group(1), 0), m.group(0)[:100])
         for m in pat.finditer(txt)),
        reverse=True)[:12]
    print("-- largest op outputs --")
    for b, line in big:
        print(f"{b/1e6:9.1f} MB  {line}")


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kwargs[k] = int(v) if v.isdigit() else v
    main(**kwargs)
