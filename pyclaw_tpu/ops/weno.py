"""Pallas WENO5 kernel.

Fused TPU counterpart of ``limiters/recon.py — weno5`` (reference
``sharpclaw/weno.f90 — weno5`` :~1-1000): all five stencil shifts, the
Jiang-Shu smoothness indicators, and both edge reconstructions execute in
one VMEM-resident kernel — pure VPU stencil arithmetic with compile-time
coefficients (the "easiest big win" of SURVEY.md §7.5).

The stencil runs along the LAST axis; leading axes are batch rows, tiled
across the Pallas grid (no halo between row tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..limiters.recon import EPWENO


def _interpret():
    # PYCLAW_TPU_PALLAS_INTERPRET=1 forces interpret mode even on TPU —
    # the debug "sanitizer" (SURVEY.md §5.2): runs the kernel as plain
    # traced jnp so out-of-bounds reads / race-y writes surface as
    # ordinary XLA errors with full shape checking.
    import os
    if os.environ.get("PYCLAW_TPU_PALLAS_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def _weno5_kernel(q_ref, ql_ref, qr_ref):
    v0 = q_ref[:]

    nlast = v0.shape[-1]

    def shift(k):
        # out[..., i] = v0[..., i+k]  (pltpu.roll needs a non-negative
        # int32 shift — i64 fails Mosaic verification under x64)
        return pltpu.roll(v0, jnp.int32((-k) % nlast), axis=v0.ndim - 1)

    vm2, vm1, vp1, vp2 = shift(-2), shift(-1), shift(1), shift(2)

    b0 = (13.0 / 12.0) * (vm2 - 2.0 * vm1 + v0) ** 2 \
        + 0.25 * (vm2 - 4.0 * vm1 + 3.0 * v0) ** 2
    b1 = (13.0 / 12.0) * (vm1 - 2.0 * v0 + vp1) ** 2 \
        + 0.25 * (vm1 - vp1) ** 2
    b2 = (13.0 / 12.0) * (v0 - 2.0 * vp1 + vp2) ** 2 \
        + 0.25 * (3.0 * v0 - 4.0 * vp1 + vp2) ** 2
    ib0 = 1.0 / (EPWENO + b0) ** 2
    ib1 = 1.0 / (EPWENO + b1) ** 2
    ib2 = 1.0 / (EPWENO + b2) ** 2

    p0 = (2.0 * vm2 - 7.0 * vm1 + 11.0 * v0) / 6.0
    p1 = (-vm1 + 5.0 * v0 + 2.0 * vp1) / 6.0
    p2 = (2.0 * v0 + 5.0 * vp1 - vp2) / 6.0
    a0 = 0.1 * ib0
    a1 = 0.6 * ib1
    a2 = 0.3 * ib2
    qr_ref[:] = (a0 * p0 + a1 * p1 + a2 * p2) / (a0 + a1 + a2)

    m0 = (-vm2 + 5.0 * vm1 + 2.0 * v0) / 6.0
    m1 = (2.0 * vm1 + 5.0 * v0 - vp1) / 6.0
    m2 = (11.0 * v0 - 7.0 * vp1 + 2.0 * vp2) / 6.0
    c0 = 0.3 * ib0
    c1 = 0.6 * ib1
    c2 = 0.1 * ib2
    ql_ref[:] = (c0 * m0 + c1 * m1 + c2 * m2) / (c0 + c1 + c2)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def weno5_pallas(q, row_tile=8):
    """WENO5 edge reconstruction, Pallas-fused.  q: (..., n); returns
    (ql, qr) with the weno5() convention (wrap-around band invalid, as in
    the XLA version — callers keep num_ghost >= 3)."""
    shape = q.shape
    n = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    q2 = q.reshape(rows, n)
    tile = min(row_tile, rows)
    while rows % tile:
        tile -= 1
    grid = (rows // tile,)
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    from . import mosaic_ctx
    with mosaic_ctx(q.dtype):
        ql, qr = pl.pallas_call(
            _weno5_kernel,
            grid=grid,
            in_specs=[spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((rows, n), q.dtype),
                       jax.ShapeDtypeStruct((rows, n), q.dtype)),
            interpret=_interpret(),
        )(q2)
    return ql.reshape(shape), qr.reshape(shape)
