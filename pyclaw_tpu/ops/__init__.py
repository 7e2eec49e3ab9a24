"""Pallas TPU kernels — the fused 'native' compute backend.

These are the hand-fused counterparts of the pure-XLA kernels in
classic/kernels.py and sharpclaw/kernels.py (the reference's Fortran
step1/flux1/weno.f90 layer; SURVEY.md §2.2/§2.3).  Selected via
``solver.backend = 'pallas'`` — the TPU analog of the reference's
``kernel_language = 'Fortran'`` seam.  Identical results to the XLA
backend within roundoff are a test oracle (SURVEY.md §4).

On non-TPU platforms the kernels run in Pallas interpret mode (the
"sanitizer" mode of SURVEY.md §5.2), so the whole test suite exercises
them on CPU.  weno5 and step1 are independent re-derivations and serve
as dual-backend oracles; the single-block step2 wrapper reuses the XLA
kernel body and is a smoke path only.

NOTE (dev-environment, round-5 status): the axon tunnel's AOT compile
helper compiles Mosaic again (rounds 3-4 it returned HTTP 500 / crashed)
— with one environment-specific trap, diagnosed 2026-08-21: under
jax_enable_x64 (this package's default), Pallas grid/BlockSpec index
arithmetic traces as i64 and Mosaic fails with ``failed to legalize
operation 'func.return'``.  The fix is :func:`mosaic_ctx` below — trace
the pallas_call under ``jax.enable_x64(False)`` whenever the data is not
f64 (the TPU production path is f32, so kernel numerics are unaffected;
f64 runs use interpret mode anyway).  All kernels in this package wrap
their pallas_call in it.  Measured on-chip numbers live in
docs/performance.md.
"""

import contextlib


def mosaic_ctx(dtype):
    """Trace-time context for pallas_call: disable x64 so index/grid
    scalars are i32 (Mosaic through this tunnel cannot legalize i64
    index arithmetic — see module docstring).  No-op for f64 data
    (which only runs in interpret mode here) and when x64 is globally
    off."""
    import jax
    import jax.numpy as jnp
    if jnp.dtype(dtype) == jnp.float64:
        return contextlib.nullcontext()
    return jax.enable_x64(False)


from .sweep import step1_pallas  # noqa: E402,F401
from .sweep2d import step2_pallas  # noqa: E402,F401
from .tiled2d import step2_pallas_tiled  # noqa: E402,F401
from .weno import weno5_pallas  # noqa: E402,F401
