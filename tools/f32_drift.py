"""Long-horizon f32 shock-drift study (VERDICT r4 item 6).

docs/performance.md used to say "shock-dominated long runs accumulate
more drift; validate per problem" with no recorded bound.  This tool
measures it for the two canonical shock workloads:

  * Woodward-Colella interacting blast waves (1D Euler, SSP33+WENO5,
    custom reflecting walls, tfinal=0.038 — ~1000 adaptive steps of
    strong shock interactions)
  * 2D Euler Riemann quadrants at 256^2 to t=0.8 (the headline
    workload run to its full BASELINE horizon, ~700 classic CTU steps)

Protocol (the tunneled chip cannot host f64 reference runs — f64 is
software-emulated ~100x; and jax_platforms is process-global):

  python tools/f32_drift.py reference   # CPU, f64 -> /tmp/drift_ref
  python tools/f32_drift.py compare     # default device, f32; prints
                                        # one JSON line of drift stats

Drift metric: max-abs error against the f64 reference, relative to the
reference's max magnitude (the tpu_validate convention), plus the L1
relative error (shock drift concentrates in O(few)-cell front shifts,
so the max-abs number is dominated by the steepest front while L1
reflects the bulk solution).
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import numpy as np

REF_DIR = "/tmp/drift_ref"

CASES = [
    ("blast", "woodward_colella_blast", dict(nx=800)),
    ("quadrants_t08", "euler_2d_quadrants",
     dict(mx=256, my=256, solver_type="classic")),
]


def _run(module, kwargs, dtype=None):
    mod = __import__(module)
    claw = mod.setup(outdir=None, **kwargs)
    if dtype is not None:
        st = claw.solution.state
        st.dtype = np.dtype(dtype)
        st.q = st.q.astype(dtype)
    claw.run()
    return np.asarray(claw.solution.q, dtype=np.float64), claw.solution.t


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "reference":
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(REF_DIR, exist_ok=True)
        for name, module, kwargs in CASES:
            q, t = _run(module, kwargs)
            np.savez_compressed(os.path.join(REF_DIR, f"{name}.npz"),
                                q=q, t=t)
            print(f"{name}: f64 reference t={t} -> {REF_DIR}/{name}.npz")
        return

    out = {}
    for name, module, kwargs in CASES:
        ref = np.load(os.path.join(REF_DIR, f"{name}.npz"))
        q, t = _run(module, kwargs, dtype="float32")
        scale = float(np.max(np.abs(ref["q"])))
        rel_max = float(np.max(np.abs(q - ref["q"]))) / scale
        rel_l1 = (float(np.sum(np.abs(q - ref["q"])))
                  / float(np.sum(np.abs(ref["q"]))))
        out[name] = {"t": float(t), "rel_max": round(rel_max, 6),
                     "rel_l1": round(rel_l1, 8)}
    import jax
    print(json.dumps({"device": str(jax.devices()[0]), "cases": out}))


if __name__ == "__main__":
    main()
