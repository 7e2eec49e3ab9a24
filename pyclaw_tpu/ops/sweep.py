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
        # roll-form body (round 5): Mosaic cannot legalize the
        # concat-based limiter dot assembly ("result/input offset
        # mismatch on non-concat dimension"), so every quantity keeps
        # the full (num_eqn, n) shape with interface k at index k and
        # circular rolls for neighbor access — the 1D instance of the
        # kernels.step2_roll/step3_roll scheme, bit-identical on the
        # interior (wrap garbage depth <= 2 < g)
        if has_aux:
            q_ref, aux_ref, dt_ref, out_ref, cfl_ref = refs
            # lifted to (num, 1, n): Mosaic rejects 1D dynamic_rotates
            # and mis-lays-out stacks of (n,) pieces inside the rp; with
            # a dummy row every intermediate is >= 2D exactly like the
            # (working) 2D/3D kernels
            aux = aux_ref[:][:, None, :]
        else:
            q_ref, dt_ref, out_ref, cfl_ref = refs
            aux = None
        q = q_ref[:][:, None, :]
        dtv = dt_ref[0, 0]

        def up(a, k=1):
            return pltpu.roll(a, jnp.int32((-k) % a.shape[-1]),
                              a.ndim - 1)

        def down(a, k=1):
            return pltpu.roll(a, jnp.int32(k), a.ndim - 1)

        q_l, q_r = q, up(q)
        aux_l = aux if aux is not None else None
        aux_r = up(aux) if aux is not None else None

        wave, s, amdq, apdq = rp(0, q_l, q_r, aux_l, aux_r, params)

        capa = aux[index_capa] if index_capa >= 0 else None
        if capa is None:
            dtdx = jnp.full((1, n), dtv / dx, dtype=q.dtype)
        else:
            dtdx = dtv / (dx * capa)

        s_int = s[..., g - 1:n - g]
        cfl_ref[0, 0] = jnp.max(
            jnp.maximum(s_int * up(dtdx)[:, g - 1:n - g],
                        -s_int * dtdx[:, g - 1:n - g]))

        q_new = q - dtdx * (down(apdq) + amdq)

        if order == 2:
            # factored phi form (the limited wave tensor is never
            # materialized), with roll-form limiter dots
            dtdxave = 0.5 * (dtdx + up(dtdx))
            wnorm2 = jnp.sum(wave * wave, axis=0)
            ddot = jnp.sum(wave * up(wave), axis=0)
            dotu = jnp.where(s > 0.0, down(ddot), ddot)
            safe = wnorm2 > 0.0
            theta = jnp.where(safe,
                              dotu / jnp.where(safe, wnorm2, 1.0), 0.0)
            phis = []
            for p in range(wave.shape[1]):
                lid = mthlim[p] if p < len(mthlim) else mthlim[-1]
                if lid == 0:
                    phis.append(jnp.ones_like(theta[p]))
                else:
                    if int(lid) in tvd.CFL_LIMITER_IDS:
                        ph = tvd._phi_cfl(int(lid), theta[p],
                                          jnp.abs(s[p]) * dtdxave)
                    else:
                        ph = tvd._phi(int(lid), theta[p])
                    phis.append(jnp.where(safe[p], ph, 1.0))
            phi = jnp.stack(phis)
            abss = jnp.abs(s)
            if fwave:
                coef = 0.5 * jnp.sign(s) * (1.0 - abss * dtdxave)
            else:
                coef = 0.5 * abss * (1.0 - abss * dtdxave)
            cqxx = jnp.sum((coef * phi)[None] * wave, axis=1)
            q_new = q_new - dtdx * (cqxx - down(cqxx))

        out_ref[:] = q_new[:, 0, g:n - g]

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
