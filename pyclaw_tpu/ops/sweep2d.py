"""Pallas fused classic 2D unsplit sweep.

Fused TPU counterpart of ``classic/kernels.py — step2`` (reference
``classic/step2.f90`` + ``flux2.f90``): one VMEM-resident kernel runs the
whole {x/y Riemann solves, wave limiting, correction fluxes, transverse
corner-transport scatter, cell update, CFL} program on a block.  The
Riemann and transverse solvers are arbitrary pure-jnp callables traced
INTO the kernel (the Pallas analog of the reference passing f2py
``._cpointer`` function pointers into step2).

This is the single-block version: the ghost-padded array must fit VMEM
(~16 MB ⇒ up to ~256x256xf32x4eqn comfortably); production grids run the
row-tiled kernels in ops/tiled2d.py (the round-5 on-silicon path — see
docs/performance.md) with the XLA backend as the general fallback.
Interpret mode on CPU makes THIS single-block wrapper a smoke path only
— it calls the SAME kernel body as the XLA backend, so it is NOT an
independent oracle (the tiled kernels are).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..classic import kernels


def _interpret():
    # PYCLAW_TPU_PALLAS_INTERPRET=1 forces interpret mode even on TPU —
    # the debug "sanitizer" (SURVEY.md §5.2): runs the kernel as plain
    # traced jnp so out-of-bounds reads / race-y writes surface as
    # ordinary XLA errors with full shape checking.
    import os
    if os.environ.get("PYCLAW_TPU_PALLAS_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def step2_pallas(qbc, auxbc, dt, dx, dy, rp, rpt, params, mthlim, order,
                 fwave, index_capa, num_ghost, transverse_waves=2):
    """Fused 2D unsplit step on ghost-padded arrays.  Same contract as
    classic.kernels.step2: qbc (num_eqn, nx, ny) -> (q interior, cfl)."""
    g = num_ghost
    num_eqn, nx, ny = qbc.shape
    mx, my = nx - 2 * g, ny - 2 * g
    has_aux = auxbc is not None

    def kernel(*refs):
        if has_aux:
            q_ref, aux_ref, dt_ref, out_ref, cfl_ref = refs
            aux = aux_ref[:]
        else:
            q_ref, dt_ref, out_ref, cfl_ref = refs
            aux = None
        q = q_ref[:]
        dtv = dt_ref[0, 0]
        q_new, cfl = kernels.step2(q, aux, dtv, dx, dy, rp, rpt, params,
                                   mthlim, order, fwave, index_capa, g,
                                   transverse_waves=transverse_waves)
        out_ref[:] = q_new
        cfl_ref[0, 0] = cfl

    dt_arr = jnp.asarray(dt, dtype=qbc.dtype).reshape(1, 1)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [vspec] + ([vspec] if has_aux else []) + [sspec]
    args = (qbc,) + ((auxbc,) if has_aux else ()) + (dt_arr,)
    from . import mosaic_ctx
    with mosaic_ctx(qbc.dtype):
        q_out, cfl = pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=(vspec, sspec),
            out_shape=(jax.ShapeDtypeStruct((num_eqn, mx, my), qbc.dtype),
                       jax.ShapeDtypeStruct((1, 1), qbc.dtype)),
            interpret=_interpret(),
        )(*args)
    return q_out, cfl[0, 0]
