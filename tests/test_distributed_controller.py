"""Multi-host execution path, end-to-end through the Controller
(SURVEY.md §2.6/§3.3; petclaw rank-0 logging + collective petsc IO):

  - a distributed run through parallel.Controller writes per-shard files
    (no global gather) via output_format='sharded',
  - the frame reads back bit-equal to the serial run (decomposition
    invariance through the FULL Controller+IO stack),
  - a run RESTARTED from a sharded frame reproduces the uninterrupted
    serial run exactly (fixed dt so the step sequences align),
  - init_distributed is an idempotent no-op in a single-process world.
"""

import glob
import os

import numpy as np

import jax

import pyclaw_tpu as pyclaw
from pyclaw_tpu import parallel, riemann

DT = 5e-4
T1, T2 = 0.01, 0.02


def _setup(solver):
    solver.all_bcs = pyclaw.BC.periodic
    solver.dt_initial = DT
    solver.dt_variable = False
    domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [32, 32])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
    x, y = domain.grid.c_centers
    state.q[0] = np.exp(-80.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
    state.q[1:] = 0.0
    return pyclaw.Solution(state, domain)


def _run(controller, solver, tfinal, outdir, fmt, solution=None):
    controller.solver = solver
    controller.solution = solution if solution is not None \
        else _setup(solver)
    controller.tfinal = tfinal
    controller.num_output_times = 2 if tfinal == T2 else 1
    controller.output_format = fmt
    if outdir is not None:
        controller.outdir = outdir
    controller.keep_copy = True
    controller.run()
    return controller


def test_distributed_controller_sharded_io_and_restart(tmp_path):
    assert len(jax.devices()) == 8
    outdir = str(tmp_path)

    # ---- serial reference (no files) ---------------------------------
    ser = _run(pyclaw.Controller(), pyclaw.ClawSolver2D(riemann.acoustics_2D),
               T2, None, None)
    q_serial_t1 = np.asarray(ser.frames[1].q)
    q_serial_t2 = np.asarray(ser.frames[2].q)

    # ---- distributed run, sharded frames ------------------------------
    dist = _run(parallel.Controller(),
                parallel.ClawSolver2D(riemann.acoustics_2D),
                T2, outdir, "sharded")

    # every frame >=1 is written as one file per device (4x2 mesh)
    shards_f1 = glob.glob(os.path.join(outdir, "shard0001_p*.h5"))
    assert len(shards_f1) == 8
    assert os.path.exists(os.path.join(outdir, "shard0002.json"))

    # decomposition invariance THROUGH the IO stack
    sol1 = pyclaw.Solution(1, path=outdir, file_format="sharded")
    sol2 = pyclaw.Solution(2, path=outdir, file_format="sharded")
    assert abs(sol1.t - T1) < 1e-12
    np.testing.assert_allclose(np.asarray(sol1.q), q_serial_t1, atol=1e-13)
    np.testing.assert_allclose(np.asarray(sol2.q), q_serial_t2, atol=1e-13)
    # geometry survives the round trip
    assert sol2.domain.patches[0].num_cells_global == [32, 32]
    assert abs(sol2.state.problem_data["bulk"] - 4.0) < 1e-15

    # ---- restart from the sharded t=T1 frame --------------------------
    restart = pyclaw.Solution(1, path=outdir, file_format="sharded")
    solver2 = parallel.ClawSolver2D(riemann.acoustics_2D)
    solver2.all_bcs = pyclaw.BC.periodic
    solver2.dt_initial = DT
    solver2.dt_variable = False
    rst = _run(parallel.Controller(), solver2, T2, str(tmp_path / "rst"),
               "sharded", solution=restart)
    np.testing.assert_allclose(np.asarray(rst.solution.q), q_serial_t2,
                               atol=1e-13)


def test_init_distributed_single_process_noop():
    info = parallel.init_distributed()
    assert info == (0, 1)
    assert parallel.is_main_process()
    assert parallel.process_count() == 1
    # idempotent
    assert parallel.init_distributed() == (0, 1)


def test_parallel_controller_gather_format_still_works(tmp_path):
    """Single-host distributed runs may still use gather formats (ascii)."""
    outdir = str(tmp_path)
    _run(parallel.Controller(), parallel.ClawSolver2D(riemann.acoustics_2D),
         T1, outdir, "ascii")
    assert os.path.exists(os.path.join(outdir, "fort.q0001"))
    sol = pyclaw.Solution(1, path=outdir, file_format="ascii")
    assert abs(sol.t - T1) < 1e-12
