"""Genuinely tiled Pallas 2D unsplit sweep (SURVEY.md §2.2 step2 row,
§7.4): the interior grid is divided into (tile_m, tile_n) blocks —
(8, 128)-aligned for the f32 VPU — and each program DMAs its tile PLUS a
num_ghost halo apron from HBM into VMEM, runs the full unsplit CTU step
on-chip (Riemann solves, limiter, transverse corner transport, update),
and writes back only its interior tile and a per-tile CFL.

The per-tile body is ``classic.soa.step2_soa`` — an implementation
independent of the generic AoS kernel ``classic.kernels.step2``, so the
dual-backend oracle (tests/test_pallas_backend.py) compares genuinely
different code paths.  Its contract is exactly the tile contract:
ghost-padded slab in, interior out.

Mosaic cannot compile through this dev environment's tunneled TPU
(ops/__init__.py note), so the kernel is exercised in interpret mode on
CPU; on directly-attached TPUs it compiles normally.  Tile shapes must
divide the interior grid — callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..classic import soa


def _interpret():
    if os.environ.get("PYCLAW_TPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def tile_grid(interior, tile):
    """(n_tiles_i, n_tiles_j) or None if the tile doesn't divide."""
    (nx, ny), (tm, tn) = interior, tile
    if nx % tm or ny % tn:
        return None
    return nx // tm, ny // tn


def step2_pallas_tiled(qbc, dt, dx, dy, rpn_soa, rpt_soa, params, mthlim,
                       order, num_ghost, transverse_waves=2,
                       tile=(8, 128)):
    """Tiled 2D unsplit classic step.  qbc: (num_eqn, nx, ny) ghost-
    padded; returns (q_interior, cfl) like kernels.step2 (aux-free /
    no-capacity case, same as the SoA fast path)."""
    g = num_ghost
    num_eqn, nxg, nyg = qbc.shape
    nx, ny = nxg - 2 * g, nyg - 2 * g
    grid = tile_grid((nx, ny), tile)
    if grid is None:
        # odd shapes (e.g. the overlap path's boundary bands): one
        # covering tile — still the same kernel body
        tile = (nx, ny)
        grid = (1, 1)
    tm, tn = tile

    def kernel(dt_ref, q_hbm, out_ref, cfl_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(i * tm, tm + 2 * g),
                     pl.ds(j * tn, tn + 2 * g)],
            slab, sem)
        dma.start()
        dma.wait()
        q_new, cfl = soa.step2_soa(slab[...], dt_ref[0], dx, dy, rpn_soa,
                                   rpt_soa, params, mthlim, order, g,
                                   transverse_waves=transverse_waves)
        out_ref[...] = q_new
        cfl_ref[i, j] = cfl

    out_shape = (
        jax.ShapeDtypeStruct((num_eqn, nx, ny), qbc.dtype),
        jax.ShapeDtypeStruct(grid, qbc.dtype),
    )
    out_specs = (
        pl.BlockSpec((num_eqn, tm, tn), lambda i, j: (0, i, j)),
        # whole-array SMEM output, one element written per program
        # (a (1,1) block spec violates Mosaic's (8,128) block rule)
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    dt_arr = jnp.asarray(dt, qbc.dtype).reshape(1)
    q_out, cfl_tiles = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((num_eqn, tm + 2 * g, tn + 2 * g), qbc.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(dt_arr, qbc)
    return q_out, jnp.max(cfl_tiles)


def step2_pallas_tiled_generic(qbc, auxbc, dt, dx, dy, rp, rpt, params,
                               mthlim, order, fwave, index_capa,
                               num_ghost, transverse_waves=2,
                               tile=(8, 128)):
    """Generic-AoS tiled Pallas step (VERDICT r2 item 8: the tiled
    kernel widened to aux/capacity/fwave systems): same halo-apron DMA
    structure as :func:`step2_pallas_tiled`, with the per-tile body
    being the full generic ``classic.kernels.step2`` — so ANY registered
    Riemann solver (aux-carrying, capacity, fwave) runs blocked in VMEM
    rather than requiring the whole grid resident.  qbc (num_eqn,nx,ny)
    ghost-padded -> (q interior, cfl)."""
    from ..classic import kernels

    g = num_ghost
    num_eqn, nxg, nyg = qbc.shape
    nx, ny = nxg - 2 * g, nyg - 2 * g
    grid = tile_grid((nx, ny), tile)
    if grid is None:
        tile = (nx, ny)
        grid = (1, 1)
    tm, tn = tile
    has_aux = auxbc is not None
    num_aux = auxbc.shape[0] if has_aux else 0

    def kernel(*refs):
        if has_aux:
            (dt_ref, q_hbm, aux_hbm, out_ref, cfl_ref,
             slab, aslab, sem, asem) = refs
        else:
            dt_ref, q_hbm, out_ref, cfl_ref, slab, sem = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(i * tm, tm + 2 * g),
                     pl.ds(j * tn, tn + 2 * g)],
            slab, sem)
        dma.start()
        if has_aux:
            adma = pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(i * tm, tm + 2 * g),
                           pl.ds(j * tn, tn + 2 * g)],
                aslab, asem)
            adma.start()
            adma.wait()
        dma.wait()
        aux_t = aslab[...] if has_aux else None
        q_new, cfl = kernels.step2(
            slab[...], aux_t, dt_ref[0], dx, dy, rp, rpt, params,
            mthlim, order, fwave, index_capa, g,
            transverse_waves=transverse_waves)
        out_ref[...] = q_new
        cfl_ref[i, j] = cfl

    out_shape = (
        jax.ShapeDtypeStruct((num_eqn, nx, ny), qbc.dtype),
        jax.ShapeDtypeStruct(grid, qbc.dtype),
    )
    out_specs = (
        pl.BlockSpec((num_eqn, tm, tn), lambda i, j: (0, i, j)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [pltpu.VMEM((num_eqn, tm + 2 * g, tn + 2 * g), qbc.dtype),
               pltpu.SemaphoreType.DMA]
    args = [jnp.asarray(dt, qbc.dtype).reshape(1), qbc]
    if has_aux:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.insert(1, pltpu.VMEM(
            (num_aux, tm + 2 * g, tn + 2 * g), auxbc.dtype))
        scratch.append(pltpu.SemaphoreType.DMA)
        args.append(auxbc)

    q_out, cfl_tiles = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)
    return q_out, jnp.max(cfl_tiles)
