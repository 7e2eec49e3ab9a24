"""pyclaw_tpu — a TPU-native finite-volume framework for hyperbolic PDEs.

Brand-new JAX/XLA/Pallas rebuild with the capabilities of clawpack/pyclaw
(reference: ashutoshagnihotri12/pyclaw; design blueprint: SURVEY.md).  The
user API mirrors the reference (SURVEY.md §0 canonical program):

    import pyclaw_tpu as pyclaw
    from pyclaw_tpu import riemann
    solver = pyclaw.ClawSolver2D(riemann.euler_4wave_2D)
    solver.all_bcs = pyclaw.BC.extrap
    domain = pyclaw.Domain([0., 0.], [1., 1.], [mx, my])
    state = pyclaw.State(domain, solver.rp.num_eqn)
    state.problem_data['gamma'] = 1.4
    state.q[...] = <initial condition>
    claw = pyclaw.Controller()
    claw.solution = pyclaw.Solution(state, domain)
    claw.solver = solver
    claw.tfinal = 0.6
    claw.run()
"""

from . import config  # noqa: F401  (sets x64 before anything else)

from .cfl import CFL  # noqa: F401,E402
from .controller import Controller  # noqa: F401,E402
from .geometry import Dimension, Domain, Grid, Patch  # noqa: F401,E402
from .solution import Solution  # noqa: F401,E402
from .solver import BC, Solver  # noqa: F401,E402
from .state import State  # noqa: F401,E402
from .classic import ClawSolver1D, ClawSolver2D, ClawSolver3D  # noqa: F401,E402
from .sharpclaw import (SharpClawSolver1D, SharpClawSolver2D,  # noqa: F401,E402
                        SharpClawSolver3D)
from . import limiters, plot, util  # noqa: F401,E402

__version__ = "0.1.0"
