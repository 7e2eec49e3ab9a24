"""Pallas fused classic 1D sweep.

Fused TPU counterpart of ``classic/kernels.py — step1`` (reference
``classic/step1.f90`` :~1-160): one VMEM-resident kernel runs
{Riemann solve, wave limiting, correction fluxes, cell update, local CFL}
— the {recon, rp, limiter, update} fusion that SURVEY.md §6 calls
"speed-of-light" for these (zero-MXU, VPU+HBM-bound) workloads.

The Riemann solver is an arbitrary pure-jnp callable traced INTO the
kernel — the Pallas analog of the reference passing f2py ``._cpointer``
function pointers into step1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..limiters import tvd


def _interpret():
    # PYCLAW_TPU_PALLAS_INTERPRET=1 forces interpret mode even on TPU —
    # the debug "sanitizer" (SURVEY.md §5.2): runs the kernel as plain
    # traced jnp so out-of-bounds reads / race-y writes surface as
    # ordinary XLA errors with full shape checking.
    import os
    if os.environ.get("PYCLAW_TPU_PALLAS_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def step1_pallas(qbc, auxbc, dt, dx, rp, params, mthlim, order, fwave,
                 index_capa, num_ghost):
    """Fused 1D sweep on ghost-padded arrays.  Same contract as
    classic.kernels.step1 for the 1D case: qbc (num_eqn, n) ->
    (q_interior (num_eqn, mx), cfl)."""
    g = num_ghost
    num_eqn, n = qbc.shape
    mx = n - 2 * g
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

        q_l, q_r = q[:, :-1], q[:, 1:]
        aux_l = aux[:, :-1] if aux is not None else None
        aux_r = aux[:, 1:] if aux is not None else None

        wave, s, amdq, apdq = rp(0, q_l, q_r, aux_l, aux_r, params)

        capa = aux[index_capa] if index_capa >= 0 else None
        if capa is None:
            dtdx = jnp.full((n,), dtv / dx, dtype=q.dtype)
        else:
            dtdx = dtv / (dx * capa)

        s_int = s[..., g - 1:n - g]
        cfl_ref[0, 0] = jnp.max(
            jnp.maximum(s_int * dtdx[g:n - g + 1],
                        -s_int * dtdx[g - 1:n - g]))

        dq1 = apdq[:, :-1] + amdq[:, 1:]
        q_new = q[:, 1:-1] - dtdx[1:-1] * dq1

        if order == 2:
            # factored phi form (identical to the XLA kernel's traffic
            # strategy): the limited wave tensor is never materialized
            dtdxave = 0.5 * (dtdx[:-1] + dtdx[1:])
            phi = tvd.limiter_phi(num_eqn, wave, s, mthlim, dtdx=dtdxave)
            abss = jnp.abs(s)
            if fwave:
                coef = 0.5 * jnp.sign(s) * (1.0 - abss * dtdxave)
            else:
                coef = 0.5 * abss * (1.0 - abss * dtdxave)
            cqxx = jnp.sum((coef * phi)[None] * wave, axis=1)
            q_new = q_new - dtdx[1:-1] * (cqxx[:, 1:] - cqxx[:, :-1])

        out_ref[:] = q_new[:, g - 1:n - 1 - g]

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
            out_shape=(jax.ShapeDtypeStruct((num_eqn, mx), qbc.dtype),
                       jax.ShapeDtypeStruct((1, 1), qbc.dtype)),
            interpret=_interpret(),
        )(*args)
    return q_out, cfl[0, 0]
