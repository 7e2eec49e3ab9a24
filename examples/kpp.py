"""KPP rotating-wave problem (reference examples/kpp/kpp.py):

    q_t + sin(q)_x + cos(q)_y = 0

A genuinely 2D scalar conservation law with a NONCONVEX flux — the
classic stress test for multi-D upwinding (Kurganov-Petrova-Popov 2007).
The exact entropy solution develops a rotating spiral wave; schemes
with insufficient dissipation lock onto a wrong (non-entropy) shock.
The Riemann solver (pyclaw_tpu/riemann/kpp.py) uses global-bound
Rusanov dissipation, which is provably monotone for |f'| <= 1.
"""

import numpy as np

import pyclaw_tpu as pyclaw
from pyclaw_tpu import riemann


def setup(mx=200, my=200, kernel_language="xla", solver_type="classic",
          outdir="./_output"):
    if solver_type == "classic":
        solver = pyclaw.ClawSolver2D(riemann.kpp_2D)
        solver.limiters = [pyclaw.limiters.tvd.minmod]
        solver.dimensional_split = False
        solver.transverse_waves = 2
        # nonconvex flux: keep the step well inside the monotonicity
        # bound of the Rusanov dissipation (overshoots feed the wrong,
        # non-entropy spiral branch at CFL near 1)
        solver.cfl_desired, solver.cfl_max = 0.45, 0.5
    else:
        solver = pyclaw.SharpClawSolver2D(riemann.kpp_2D)
    solver.backend = kernel_language
    solver.all_bcs = pyclaw.BC.extrap

    domain = pyclaw.Domain([-2.0, -2.5], [2.0, 1.5], [mx, my])
    state = pyclaw.State(domain, solver.rp.num_eqn)

    x, y = domain.grid.c_centers
    r = np.sqrt(x ** 2 + y ** 2)
    # IC from the reference: 14π/4 inside the unit disk, π/4 outside
    state.q[0] = np.where(r <= 1.0, 14.0 * np.pi / 4.0, np.pi / 4.0)

    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 1.0
    claw.num_output_times = 10
    claw.outdir = outdir
    if outdir is None:
        claw.output_format = None
    return claw


def setplot(plotdata):
    plotdata.clearfigures()
    plotfigure = plotdata.new_plotfigure(name="q", figno=0)
    plotaxes = plotfigure.new_plotaxes()
    plotaxes.title = "q (KPP rotating wave)"
    plotitem = plotaxes.new_plotitem(plot_type="2d_pcolor")
    plotitem.plot_var = 0
    plotitem.pcolor_cmin = 0.0
    plotitem.pcolor_cmax = 4.0 * np.pi
    return plotdata


if __name__ == "__main__":
    from pyclaw_tpu.util import run_app_from_main
    run_app_from_main(setup, setplot)
