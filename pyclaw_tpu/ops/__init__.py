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

NOTE (dev-environment): the axon-tunneled TPU in this build environment
currently fails to compile Mosaic kernels (its remote-compile helper
returns HTTP 500 even for a trivial pallas_call, 2026-08-17), so
backend='xla' remains the default; on directly-attached TPUs these
kernels compile normally.  Measured XLA-backend throughput and the
roofline gap live in docs/performance.md — the fused kernels are the
path to closing it, not a correctness dependency.
"""

from .sweep import step1_pallas  # noqa: F401
from .sweep2d import step2_pallas  # noqa: F401
from .tiled2d import step2_pallas_tiled  # noqa: F401
from .weno import weno5_pallas  # noqa: F401
