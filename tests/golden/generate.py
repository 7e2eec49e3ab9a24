"""Generate golden regression arrays (reference strategy: stored arrays
per example, SURVEY.md §4).  Run from the repo root:

    python tests/golden/generate.py

Golden files are produced by the validated CPU f64 path (exact-solution
and conservation oracles in tests/ establish their correctness) and are
compared by tests/test_golden.py with reference-style tolerances.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "examples"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))

CASES = {
    "advection_1d": ("advection_1d", dict(nx=100, solver_type="classic")),
    "advection_1d_sharpclaw": ("advection_1d",
                               dict(nx=100, solver_type="sharpclaw")),
    "acoustics_1d": ("acoustics_1d", dict(nx=100)),
    "euler_1d_sod": ("euler_1d_shocktube",
                     dict(nx=200, solver_type="classic")),
    "euler_1d_sod_sharpclaw": ("euler_1d_shocktube",
                               dict(nx=200, solver_type="sharpclaw")),
    "acoustics_2d": ("acoustics_2d", dict(mx=60, my=60)),
    "shallow_2d_radial": ("shallow_2d_radial", dict(mx=60, my=60)),
    "euler_2d_quadrants": ("euler_2d_quadrants",
                           dict(mx=80, my=80, solver_type="classic")),
    "euler_3d": ("euler_3d", dict(mx=16, my=16, mz=16)),
    "stegoton_1d": ("stegoton_1d", dict(nx=600)),
    # round-5 additions (VERDICT r4 item 5: widen the on-device f32
    # golden set to the non-smooth paths)
    "euler_2d_quadrants_128": ("euler_2d_quadrants",
                               dict(mx=128, my=128,
                                    solver_type="classic")),
    "dam_break_dry_1d": ("dam_break_dry", dict(nx=200, dimension=1)),
    "euler_1d_sod_chardecomp": ("euler_1d_shocktube",
                                dict(nx=200, solver_type="sharpclaw",
                                     char_decomp=2)),
}


def run_case(module, kwargs):
    mod = __import__(module)
    claw = mod.setup(outdir=None, **kwargs)
    claw.run()
    return claw.solution.q.copy(), claw.solution.t


def main():
    for name, (module, kwargs) in CASES.items():
        q, t = run_case(module, kwargs)
        path = os.path.join(HERE, f"{name}.npz")
        np.savez_compressed(path, q=q, t=t)
        print(f"{name}: q{q.shape} t={t} -> {path}")


if __name__ == "__main__":
    main()
