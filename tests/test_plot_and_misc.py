"""Plot module smoke tests + misc API parity (gen_variants, verbosity,
derived-quantity output)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_html_plot(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from advection_1d import setup
    claw = setup(nx=32, outdir=str(tmp_path))
    claw.num_output_times = 2
    claw.run()
    from pyclaw_tpu import plot
    plotdir = plot.html_plot(outdir=str(tmp_path))
    files = os.listdir(plotdir)
    assert "index.html" in files
    assert sum(f.endswith(".png") for f in files) == 3


def test_plot_frame_2d(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from acoustics_2d import setup
    claw = setup(mx=16, my=16, outdir=None)
    claw.run()
    from pyclaw_tpu.plot import plot_frame
    ax = plot_frame(claw.solution)
    assert ax is not None


def test_gen_variants():
    from advection_1d import setup
    from pyclaw_tpu.util import check_diff, gen_variants

    def verify(claw):
        x = claw.solution.domain.grid.x.centers
        expected = np.exp(-100.0 * (np.minimum((x - 0.75) % 1.0,
                                               1.0 - (x - 0.75) % 1.0)) ** 2)
        return check_diff(expected, claw.solution.q[0], reltol=0.05)

    tests = list(gen_variants(setup, verify, kernel_languages=("xla",),
                              solver_type="classic", nx=64))
    assert len(tests) == 1
    for t in tests:
        t()  # raises on failure


def test_write_p_output(tmp_path):
    """Derived-quantity output (compute_p / write_p; reference
    controller.py p-output path)."""
    from acoustics_1d import setup
    claw = setup(nx=32, outdir=str(tmp_path))
    claw.num_output_times = 1

    def compute_p(state):
        state.p = np.asarray(state.q[0:1]) ** 2

    claw.compute_p = compute_p
    claw.run()
    files = os.listdir(tmp_path)
    assert any(f.startswith("claw_p.q") for f in files), files

def test_observability_counters_and_profiler(tmp_path):
    """Step timer + cell-updates/s counter on solver.status and the
    jax.profiler trace hook (SURVEY.md §5.1 — a required NEW feature:
    the reference has no profiling; the rebuild's primary metric is
    cell-updates/s so the framework must self-report it)."""
    from advection_1d import setup
    claw = setup(nx=64, outdir=None)
    claw.num_output_times = 2
    claw.profile_dir = str(tmp_path / "trace")
    status = claw.run()
    ns = status["numsteps"]
    assert ns > 0
    assert status["wall_time"] > 0.0
    assert status["cell_updates"] == ns * 64
    assert status["cell_updates_per_sec"] == (
        status["cell_updates"] / status["wall_time"])
    # the profiler trace hook actually wrote a trace
    trace_files = [f for _, _, fs in os.walk(tmp_path / "trace") for f in fs]
    assert trace_files, "jax.profiler.trace produced no files"


def test_f32_run_with_numpy_scalar_problem_data():
    """np.float64 physics constants in problem_data (e.g. zz =
    np.sqrt(rho*bulk)) must not promote an f32 run to f64 inside the
    traced step (caught by the on-device f32 golden validation, r4;
    Solver._weak_params coerces them to weak-typed Python floats)."""
    import numpy as np

    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann

    solver = pyclaw.ClawSolver1D(riemann.acoustics_1D)
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0], [1.0], [32])
    state = pyclaw.State(domain, solver.rp.num_eqn, dtype="float32")
    rho, bulk = np.float64(1.0), np.float64(4.0)
    state.problem_data.update(rho=rho, bulk=bulk,
                              zz=np.sqrt(rho * bulk),
                              cc=np.sqrt(bulk / rho))
    x = domain.grid.x.centers
    state.q[0] = np.exp(-80.0 * (x - 0.5) ** 2).astype(np.float32)
    claw = pyclaw.Controller()
    claw.solver = solver
    claw.solution = pyclaw.Solution(state, domain)
    claw.tfinal = 0.05
    claw.num_output_times = 1
    claw.output_format = None
    claw.keep_copy = True
    claw.run()
    assert claw.frames[-1].q.dtype == np.float32
    assert np.all(np.isfinite(claw.frames[-1].q))
