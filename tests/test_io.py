"""IO round-trips, restart/checkpoint-resume, gauges, output styles
(reference src/pyclaw/tests/test_io.py + SURVEY.md §3.4/§5.4/§5.5)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import pyclaw_tpu as pyclaw  # noqa: E402
from pyclaw_tpu import riemann  # noqa: E402


def _make_solution(num_dim=2, num_aux=1):
    if num_dim == 1:
        domain = pyclaw.Domain([0.0], [1.0], [32])
    else:
        domain = pyclaw.Domain([0.0, -1.0], [1.0, 1.0], [16, 24])
    state = pyclaw.State(domain, 3, num_aux=num_aux)
    rng = np.random.default_rng(7)
    state.q[...] = rng.standard_normal(state.q.shape)
    if num_aux:
        state.aux[...] = rng.standard_normal(state.aux.shape)
    state.t = 0.725
    return pyclaw.Solution(state, domain)


@pytest.mark.parametrize("fmt", ["ascii", "hdf5", "netcdf"])
@pytest.mark.parametrize("num_dim", [1, 2])
def test_roundtrip(tmp_path, fmt, num_dim):
    sol = _make_solution(num_dim)
    sol.write(3, path=str(tmp_path), file_format=fmt, write_aux=True)
    sol2 = pyclaw.Solution(3, path=str(tmp_path), file_format=fmt,
                           read_aux=True)
    assert abs(sol2.t - sol.t) < 1e-12
    tol = 1e-7 if fmt == "ascii" else 1e-14   # ascii is %18.8e
    np.testing.assert_allclose(sol2.q, sol.q, rtol=tol, atol=tol)
    assert sol2.domain.num_dim == num_dim
    gtol = 1e-7 if fmt == "ascii" else 1e-12  # ascii headers are %18.8e
    for d1, d2 in zip(sol.domain.grid.dimensions, sol2.domain.grid.dimensions):
        assert abs(d1.lower - d2.lower) < gtol
        assert abs(d1.delta - d2.delta) < gtol
    if fmt in ("hdf5", "netcdf"):
        np.testing.assert_allclose(sol2.aux, sol.aux, atol=1e-14)


def test_netcdf_problem_data_and_classic_format(tmp_path):
    """netcdf frames persist problem_data scalars and are valid NetCDF-3
    64-bit-offset files (magic 'CDF\\x02')."""
    sol = _make_solution(2)
    sol.state.problem_data.update({"gamma": 1.4, "steps": 7, "flag": True})
    sol.write(0, path=str(tmp_path), file_format="netcdf")
    fname = os.path.join(str(tmp_path), "claw0000.nc")
    with open(fname, "rb") as f:
        assert f.read(4) == b"CDF\x02"
    sol2 = pyclaw.Solution(0, path=str(tmp_path), file_format="netcdf")
    assert sol2.state.problem_data["gamma"] == 1.4
    assert sol2.state.problem_data["steps"] == 7
    assert sol2.state.problem_data["flag"] is True


def test_restart_continuation(tmp_path):
    """Checkpoint-resume (SURVEY.md §3.4): run to t=0.5 writing frames,
    then rebuild identically, load frame 5, continue to t=1.0; must match
    an uninterrupted run (hdf5 frames are exact checkpoints)."""
    from advection_1d import setup

    # uninterrupted
    claw = setup(nx=64, outdir=None)
    claw.run()
    q_full = claw.solution.q.copy()

    # interrupted at frame 5 (t=0.5)
    claw1 = setup(nx=64, outdir=str(tmp_path))
    claw1.output_format = "hdf5"
    claw1.run()
    claw2 = setup(nx=64, outdir=None)
    claw2.solution = pyclaw.Solution(5, path=str(tmp_path),
                                     file_format="hdf5")
    claw2.run()
    assert abs(claw2.solution.t - 1.0) < 1e-12
    # dt sequences differ after restart (dt resets to dt_initial), so allow
    # scheme-level differences but require close agreement
    err = np.max(np.abs(claw2.solution.q - q_full))
    assert err < 2e-2, err


def test_gauges():
    from advection_1d import setup
    claw = setup(nx=64, outdir=None)
    claw.solution.domain.grid.add_gauges([[0.25], [0.75]])
    claw.run()
    data = claw.solution.state.gauge_data
    assert len(data) == 2 * claw.solver.status["numsteps"]
    # gauge 1 sits at the IC peak x0=0.75: its time series must start
    # near 1 and return near 1 at t=1 (periodic advection)
    g1 = [(t, v[0]) for (num, t, v) in data if num == 1]
    assert abs(g1[0][1] - 1.0) < 0.1
    assert abs(g1[-1][1] - 1.0) < 0.1
    # mid-run the pulse has moved away from the gauge
    mid = min(g1, key=lambda tv: abs(tv[0] - 0.5))
    assert mid[1] < 0.05


def test_gauges_traced_matches_host_loop(tmp_path):
    """The device-buffered (traced evolve loop) gauge series must equal
    the per-step host-loop series, and gauge files must land in
    <outdir>/_gauges/gauge<N>.txt."""
    from advection_1d import setup

    def run(traced, outdir=None):
        claw = setup(nx=64, outdir=outdir)
        if outdir is not None:
            claw.output_format = "ascii"
        claw.solution.domain.grid.add_gauges([[0.25], [0.75]])
        claw.solver.traced_evolve = traced
        claw.run()
        return claw

    data_t = run(True, outdir=str(tmp_path)).solution.state.gauge_data
    data_h = run(False).solution.state.gauge_data
    assert len(data_t) == len(data_h)
    for (n1, t1, v1), (n2, t2, v2) in zip(data_t, data_h):
        assert n1 == n2
        np.testing.assert_allclose(t1, t2, atol=1e-12)
        np.testing.assert_allclose(v1, v2, atol=1e-12)
    # file output
    g0 = os.path.join(str(tmp_path), "_gauges", "gauge0.txt")
    g1 = os.path.join(str(tmp_path), "_gauges", "gauge1.txt")
    assert os.path.exists(g0) and os.path.exists(g1)
    rows = np.loadtxt(g1)
    assert rows.shape[1] == 2          # t + one component
    assert abs(rows[0, 1] - 1.0) < 0.1


def test_output_style_3(tmp_path):
    from advection_1d import setup
    claw = setup(nx=64, outdir=str(tmp_path))
    claw.output_style = 3
    claw.nstepout = 5
    claw.run()
    frames = sorted(f for f in os.listdir(tmp_path) if f.startswith("fort.q"))
    nsteps = claw.solver.status["numsteps"]
    assert len(frames) == 1 + nsteps // 5


def test_output_style_2(tmp_path):
    from advection_1d import setup
    claw = setup(nx=64, outdir=str(tmp_path))
    claw.output_style = 2
    claw.out_times = [0.3, 0.6, 0.9]
    claw.run()
    frames = sorted(f for f in os.listdir(tmp_path) if f.startswith("fort.t"))
    assert len(frames) == 4  # frame 0 + three out_times
    from pyclaw_tpu.fileio.ascii import read_t
    t3 = read_t(3, str(tmp_path))[0]
    assert abs(t3 - 0.9) < 1e-12


def test_keep_copy_frames():
    from advection_1d import setup
    claw = setup(nx=64, outdir=None)
    claw.keep_copy = True
    claw.run()
    assert len(claw.frames) == 11
    assert abs(claw.frames[0].t - 0.0) < 1e-12
    assert abs(claw.frames[-1].t - 1.0) < 1e-12
    # frames are deep copies, not views
    assert claw.frames[0].q[0].max() != claw.frames[5].q[0].max() or \
        not np.allclose(claw.frames[0].q, claw.frames[5].q)


@pytest.mark.parametrize("num_dim", [1, 2, 3])
def test_native_ascii_writer_byte_identical(tmp_path, num_dim):
    """The C++ frame writer (pyclaw_tpu._native.fastio) must produce
    byte-identical fort.q files to the pure-Python formatting loops,
    including negative zeros, huge/tiny magnitudes, and blank-line
    layout."""
    from pyclaw_tpu import _native
    from pyclaw_tpu.fileio import ascii as asciimod

    if _native.get_io_lib() is None:
        pytest.skip("no native toolchain")

    if num_dim == 1:
        domain = pyclaw.Domain([0.0], [1.0], [37])
    elif num_dim == 2:
        domain = pyclaw.Domain([0.0, -1.0], [1.0, 1.0], [11, 7])
    else:
        domain = pyclaw.Domain([0.0, -1.0, 2.0], [1.0, 1.0, 3.0], [5, 7, 3])
    state = pyclaw.State(domain, 2)
    rng = np.random.default_rng(3)
    q = rng.standard_normal(state.q.shape)
    q.flat[::17] *= 1e200
    q.flat[1::23] *= 1e-200
    q.flat[2::29] = -0.0
    state.q[...] = q
    sol = pyclaw.Solution(state, domain)

    sol.write(1, str(tmp_path), file_format="ascii")
    native = (tmp_path / "fort.q0001").read_bytes()

    patch = domain.patches[0]
    with open(tmp_path / "py.q", "w") as f:
        asciimod._write_patch_header(f, patch)
        asciimod._write_array(f, np.asarray(state.q))
    python = (tmp_path / "py.q").read_bytes()
    assert native == python


def test_compute_F_functional_output(tmp_path):
    """Controller functional output (reference F_path/compute_F): one
    't sum(F_row)...' line per frame; total mass of periodic advection
    is constant."""
    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann

    def compute_F(state):
        state.F = np.asarray(state.q).copy()   # functional: cell mass

    solver = pyclaw.ClawSolver1D(riemann.advection_1D)
    solver.all_bcs = pyclaw.BC.periodic
    domain = pyclaw.Domain([0.0], [1.0], [64])
    state = pyclaw.State(domain, 1)
    state.problem_data["u"] = 1.0
    x = domain.grid.x.centers
    state.q[0] = np.exp(-80.0 * (x - 0.5) ** 2)
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.2
    claw.num_output_times = 4
    claw.outdir = str(tmp_path)
    claw.compute_F = compute_F
    claw.run()
    rows = np.loadtxt(tmp_path / "F.txt")
    assert rows.shape == (5, 2)
    np.testing.assert_allclose(rows[:, 1], rows[0, 1], rtol=1e-12)
    assert abs(rows[-1, 0] - 0.2) < 1e-12
