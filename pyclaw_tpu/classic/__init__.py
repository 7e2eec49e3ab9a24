from .solver import ClawSolver1D, ClawSolver2D, ClawSolver3D  # noqa: F401
