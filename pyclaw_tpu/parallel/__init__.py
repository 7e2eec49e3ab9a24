"""Distributed overlay — the PetClaw equivalent on TPU meshes.

Rebuild of reference ``src/petclaw/`` (SURVEY.md §2.6, §3.3, §5.8).  The
reference's design property — *the parallel overlay substitutes the data
model, not the solvers* — is preserved: the same sweep kernels run inside
``jax.shard_map`` over a device Mesh, and exactly the reference's three
per-step communication events exist:

  1. halo exchange  : DMDA globalToLocal  ->  lax.ppermute ring shifts per
                      face, axis-by-axis (BOX corner semantics for free)
  2. CFL reduction  : MPI Allreduce(MAX)  ->  lax.pmax over the mesh axes
  3. collective IO  : PETSc Viewer        ->  global jax.Array gather (small
                      grids) / per-host shard files (pyclaw_tpu.fileio)

Usage (mirrors ``import clawpack.petclaw as pyclaw``):

    from pyclaw_tpu import parallel as pyclaw
    solver = pyclaw.ClawSolver2D(riemann.euler_4wave_2D)   # distributed
    ... everything else identical ...

The solver builds a mesh over all available devices by default; pass
``mesh=`` or set ``solver.mesh`` before setup to control the decomposition.
Physical BCs are applied only by boundary-owning shards (mesh-coordinate
masking — the analog of petclaw/geometry.py ownership flags); periodic BCs
ride the ppermute ring wrap for free.
"""

from ..geometry import Dimension, Domain, Grid, Patch  # noqa: F401
from ..solution import Solution  # noqa: F401
from ..solver import BC  # noqa: F401
from ..state import State  # noqa: F401
from .controller import Controller  # noqa: F401 (process-aware, sharded IO)
from .distributed import (init_distributed, is_main_process,  # noqa: F401
                          process_count, process_index)
from .mesh import make_mesh  # noqa: F401
from .solver import (ClawSolver1D, ClawSolver2D, ClawSolver3D,  # noqa: F401
                     SharpClawSolver1D, SharpClawSolver2D, SharpClawSolver3D)
