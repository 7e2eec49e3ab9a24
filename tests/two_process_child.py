"""Child program for tests/test_two_process.py — one of N real processes.

Runs the SAME program on every process (the reference's ``mpiexec -n N``
contract, SURVEY.md §3.3/§4): ``jax.distributed.initialize`` over a
localhost coordinator, a Mesh spanning every process's CPU devices, a
``parallel.Controller`` end-to-end with sharded IO.  Cross-process
collectives (halo ppermutes + CFL pmax) ride Gloo on CPU here, ICI on a
TPU pod.  The parent test asserts decomposition invariance of the
written frames against a serial run.

Usage: python two_process_child.py <pid> <nproc> <port> <outdir> <phase>
  phase 'run':     evolve 0 -> T2, write frames 0..2
  phase 'restart': read frame 1, evolve -> T2, write into <outdir>/rst
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

DT = 5e-4
T1, T2 = 0.01, 0.02


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir, phase = sys.argv[3], sys.argv[4], sys.argv[5]

    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import parallel, riemann

    info = parallel.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert info == (pid, nproc), info
    assert jax.process_count() == nproc

    solver = parallel.ClawSolver2D(riemann.acoustics_2D)
    solver.all_bcs = pyclaw.BC.periodic
    solver.dt_initial = DT
    solver.dt_variable = False

    if phase == "restart":
        solution = pyclaw.Solution(1, path=outdir, file_format="sharded")
        outdir = outdir + "/rst"
    else:
        domain = pyclaw.Domain([0.0, 0.0], [1.0, 1.0], [32, 32])
        state = pyclaw.State(domain, solver.rp.num_eqn)
        state.problem_data.update(rho=1.0, bulk=4.0, zz=2.0, cc=2.0)
        x, y = domain.grid.c_centers
        state.q[0] = np.exp(-80.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        state.q[1:] = 0.0
        solution = pyclaw.Solution(state, domain)

    claw = parallel.Controller()
    claw.solver = solver
    claw.solution = solution
    claw.tfinal = T2
    claw.num_output_times = 2 if phase == "run" else 1
    claw.output_format = "sharded"
    claw.outdir = outdir
    claw.run()

    print(f"CHILD_OK pid={pid} phase={phase}", flush=True)


if __name__ == "__main__":
    main()
