from .solver import (SharpClawSolver1D, SharpClawSolver2D,  # noqa: F401
                     SharpClawSolver3D)
