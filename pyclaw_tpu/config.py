"""Global configuration for pyclaw_tpu.

The reference framework (clawpack/pyclaw) computes everything in Fortran
double precision.  We mirror that by enabling JAX x64 at package import, so
the default State dtype is float64 and the regression tolerances of the
reference test suite (~1e-4 .. 1e-6 rel) are meaningful.  float32 is an
opt-in performance mode: construct ``State(..., dtype=jnp.float32)`` (used by
``bench.py`` on real TPU hardware, where f64 is software-emulated).

Kernels are written so that float32 arrays stay float32 (all scalar
constants are Python floats, which are weakly typed in JAX).
"""

import os

import jax

# Mirror the reference's double-precision-by-default numerics.  Users can opt
# out before importing pyclaw_tpu by setting PYCLAW_TPU_X64=0.
if os.environ.get("PYCLAW_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402  (after x64 flag)


def default_dtype():
    """Default floating dtype for new State arrays."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# Compute-kernel backend: 'xla' = pure jnp reference kernels (readable, runs
# anywhere); 'pallas' = fused Pallas TPU sweep kernels.  Mirrors the
# reference's kernel_language = 'Fortran' | 'Python' seam
# (src/pyclaw/solver.py — Solver.kernel_language).
DEFAULT_BACKEND = os.environ.get("PYCLAW_TPU_BACKEND", "xla")
