"""Tiled Pallas sweep kernels (SURVEY.md §2.2 step2/step3 rows, §7.4) —
the round-5 on-silicon production path.

The PRODUCTION kernels here are the Mosaic-legal row/xy-tiled family
(round 5 — see each docstring and ops/__init__ for the environment
rules they encode):

  * :func:`step2_pallas_rows` — 2D classic CTU, roll-form SoA body for
    SoA-eligible systems / generic-AoS roll body (aux, capacity, fwave)
    otherwise, double-buffered input DMA;
  * :func:`dq_pallas_rows` — the SharpClaw 2D semidiscretization;
  * :func:`step3_pallas_xy` — 3D classic CTU with full rpt3/rptt3
    corner transport; aux, capacity and fwave systems included.

All bodies are shape-uniform "roll forms" of the XLA kernels —
bit-identical results, pinned by the dual-backend oracles in
tests/test_pallas_backend.py and tests/test_tiled_kernels.py.

The older (8,128)+halo-apron kernels (:func:`step2_pallas_tiled`,
:func:`step2_pallas_tiled_generic`) are kept as dispatch fallbacks for
odd geometries; their halo-apron DMA shapes violate the current
toolchain's slice-alignment rule on-chip (they run in interpret mode
and on toolchains without that restriction)."""

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


def step2_pallas_rows(qbc, auxbc, dt, dx, dy, rp, rpt, params, mthlim,
                      order, fwave, index_capa, num_ghost, rpn_soa=None,
                      rpt_soa=None, transverse_waves=2, tile_rows=16,
                      vmem_limit_mb=None, prepadded_interior=None,
                      prefactor=None):
    """Row-tiled fused 2D unsplit step — the Mosaic-legal tile geometry
    for this toolchain (round 5).

    The (8,128)+halo tiles of :func:`step2_pallas_tiled` violate the
    AOT compiler's DMA alignment rule (a halo apron of ``tile+2*g`` is
    not a multiple of the (8,128) native tiling: "Slice shape along
    dimension 1 must be aligned to tiling (8), but is 12").  This
    kernel tiles ROWS only — the Pallas analog of the XLA production
    driver ``kernels.step2_tiled`` — and keeps every DMA aligned:

      * each program DMAs ``tile_rows + 8`` full-width rows starting at
        the 8-aligned offset ``i*tile_rows`` (4 rows of deliberate
        over-fetch beyond the ``2*g = 4``-row apron, so the slice SHAPE
        is 8-aligned), from a qbc padded by 4 dead rows;
      * the body runs the whole unsplit CTU step on the ghost-padded
        sub-slab — SoA body when ``rpn_soa`` is given, the generic AoS
        ``kernels.step2`` otherwise (aux/capacity/fwave systems);
      * only the (tile_rows, ny) interior block is written back, plus a
        per-program CFL into SMEM.

    Unlike the XLA row-tiled driver (tile 128, ~40 fusions per tile,
    each round-tripping its operands through VMEM), the entire per-tile
    dataflow here lives in Mosaic's VMEM working set — which also
    bounds ``tile_rows``: the body materializes O(40) arrays of
    (num_eqn, tile_rows+4, ny+4), so ~16 MB VMEM caps tile_rows at
    ~8-32 for 1024-wide f32 Euler.  qbc (num_eqn, nx, ny) ghost-padded
    -> (q interior, cfl), same contract as kernels.step2.

    ``prepadded_interior=(nx, ny)``: the caller (the solver's aligned
    BC wrapper via bc.extend_aligned) already built qbc at the
    DMA-aligned shape — skip the internal pads (saves a full-array
    output pass per invocation)."""
    g = num_ghost
    num_eqn = qbc.shape[0]
    if prepadded_interior is not None:
        nx, ny = prepadded_interior
        nxg, nyg = nx + 2 * g, ny + 2 * g
    else:
        _, nxg, nyg = qbc.shape
        nx, ny = nxg - 2 * g, nyg - 2 * g
    tm = tile_rows
    if nx % tm or tm % 8:
        raise ValueError(
            f"step2_pallas_rows: tile_rows={tm} must be a multiple of 8 "
            f"and divide the interior rows ({nx})")
    if ny % 128:
        raise ValueError(
            f"step2_pallas_rows: interior width ({ny}) must be a "
            f"multiple of 128 (Mosaic output-block lane alignment)")
    fetch = tm + 2 * g + (-(tm + 2 * g)) % 8     # 8-aligned DMA row count
    # dead rows so the last program's over-fetch stays in bounds
    # (program i DMAs rows [i*tm, i*tm + fetch)), dead lanes so the DMA
    # slice's lane extent is 128-aligned ("Slice shape along dimension 2
    # must be aligned to tiling (128)").  The dead cells hold zeros that
    # behave exactly like the roll body's wrap-around garbage: lane roll
    # depth is <= 2 per side, so they never reach the interior window.
    pad_rows = max(0, (nx - tm + fetch) - nxg)
    pad_lanes = (-nyg) % 128
    if prepadded_interior is not None:
        assert (qbc.shape[1] >= nxg + pad_rows
                and qbc.shape[2] == nyg + pad_lanes), \
            (qbc.shape, (nxg + pad_rows, nyg + pad_lanes))
    else:
        qbc = jnp.pad(qbc, ((0, 0), (0, pad_rows), (0, pad_lanes)))
    lanes = nyg + pad_lanes
    grid = (nx // tm,)
    has_aux = auxbc is not None
    if has_aux:
        auxbc = jnp.pad(auxbc, ((0, 0), (0, pad_rows), (0, pad_lanes)))
        num_aux = auxbc.shape[0]

    from ..classic import kernels, soa

    nprog = grid[0]

    def body_on(sub, aux_t, dt_ref, out_ref, cfl_ref, i):
        # shape-uniform roll bodies: Mosaic cannot legalize the
        # pad/concat interface assembly of the XLA-tuned kernels
        def roll_tpu(a, shift, axis):
            return pltpu.roll(a, jnp.int32(shift % a.shape[axis]), axis)
        if rpn_soa is not None:
            q_new, cfl = soa.step2_soa_roll(
                sub, dt_ref[0], dx, dy, rpn_soa, rpt_soa, params,
                mthlim, order, g, transverse_waves=transverse_waves,
                roll=roll_tpu, cfl_shape=(tm + 2 * g, nyg))
        else:
            # generic AoS roll body: aux/capacity/fwave systems
            q_new, cfl = kernels.step2_roll(
                sub, aux_t, dt_ref[0], dx, dy, rp, rpt, params, mthlim,
                order, fwave, index_capa, g,
                transverse_waves=transverse_waves, prefactor=prefactor,
                roll=roll_tpu, cfl_shape=(tm + 2 * g, nyg))
        out_ref[...] = q_new[:, :, :ny]      # drop the dead lanes
        cfl_ref[i] = cfl

    def kernel_pipe(dt_ref, q_hbm, out_ref, cfl_ref,
                    slab0, slab1, sem0, sem1):
        # double-buffered input DMA (round 5, aux-free path): program i
        # computes from buffer i%2 (filled by program i-1) while the
        # DMA for tile i+1 fills the other buffer — measured +7-9% at
        # 1024^2 (the blocking wait was ~2 us of a ~17 us tile)
        from jax import lax as _lax
        i = pl.program_id(0)

        def issue(j, s, sm):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(j * tm, fetch)], s, sm).start()

        @pl.when(i == 0)
        def _():
            issue(0, slab0, sem0)

        @pl.when(i + 1 < nprog)
        def _():
            _lax.cond((i + 1) % 2 == 0,
                      lambda: issue(i + 1, slab0, sem0),
                      lambda: issue(i + 1, slab1, sem1))

        def waited(s, sm):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(i * tm, fetch)], s, sm).wait()
            return s[:, :tm + 2 * g, :]
        sub = _lax.cond(i % 2 == 0,
                        lambda: waited(slab0, sem0),
                        lambda: waited(slab1, sem1))
        body_on(sub, None, dt_ref, out_ref, cfl_ref, i)

    def kernel_blocking(*refs):
        if has_aux:
            (dt_ref, q_hbm, aux_hbm, out_ref, cfl_ref,
             slab, aslab, sem, asem) = refs
        else:
            dt_ref, q_hbm, out_ref, cfl_ref, slab, sem = refs
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(i * tm, fetch)], slab, sem)
        dma.start()
        if has_aux:
            adma = pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(i * tm, fetch)], aslab, asem)
            adma.start()
            adma.wait()
        dma.wait()
        body_on(slab[:, :tm + 2 * g, :],
                aslab[:, :tm + 2 * g, :] if has_aux else None,
                dt_ref, out_ref, cfl_ref, i)

    out_shape = (
        jax.ShapeDtypeStruct((num_eqn, nx, ny), qbc.dtype),
        jax.ShapeDtypeStruct(grid, qbc.dtype),
    )
    out_specs = (
        pl.BlockSpec((num_eqn, tm, ny), lambda i: (0, i, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    args = [jnp.asarray(dt, qbc.dtype).reshape(1), qbc]
    if has_aux:
        kernel = kernel_blocking
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch = [pltpu.VMEM((num_eqn, fetch, lanes), qbc.dtype),
                   pltpu.VMEM((num_aux, fetch, lanes), auxbc.dtype),
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]
        args.append(auxbc)
    else:
        kernel = kernel_pipe
        scratch = [pltpu.VMEM((num_eqn, fetch, lanes), qbc.dtype),
                   pltpu.VMEM((num_eqn, fetch, lanes), qbc.dtype),
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]

    kw = {}
    if vmem_limit_mb is not None and not _interpret():
        # the 16 MB default scoped-VMEM limit caps tile_rows at ~16 for
        # 1024-wide f32 Euler; the v5e has far more physical VMEM and a
        # per-kernel raise (unlike the XLA-wide flag, which round 4
        # measured as a large regression) only affects this kernel
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    from . import mosaic_ctx
    with mosaic_ctx(qbc.dtype):
        q_out, cfl_tiles = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=_interpret(),
            **kw,
        )(*args)
    return q_out, jnp.max(cfl_tiles)


def dq_pallas_rows(qbc, dt, dx, dy, rpn_soa, params, weno_order,
                   num_ghost, positivity=None, flux_soa=None,
                   tile_rows=16, vmem_limit_mb=None,
                   prepadded_interior=None):
    """Row-tiled fused SharpClaw 2D semidiscretization (the per-stage
    engine of BASELINE cfg4) — same Mosaic-legal geometry as
    :func:`step2_pallas_rows` (8-aligned over-fetch DMAs, 128-aligned
    dead lanes, roll-form SoA body ``sharpclaw.soa.dq_2d_soa_roll``).
    qbc (num_eqn, nx, ny) ghost-padded with g = (weno_order+1)//2 ->
    (dq over interior cells, cfl), the contract of kernels.dq_nd.
    ``prepadded_interior``: as in :func:`step2_pallas_rows`.

    (Negative result, round 5: fusing the SSP stage combination
    ``ca*q + cb*r + cc*dq`` into this kernel measured SLOWER — SSP33
    454 -> 389 M, SSP104 122 -> 119 M cups at 1024^2 — the separate
    XLA combine pass overlaps the next stage's work, the in-kernel
    combine serializes behind the dq compute and adds a second DMA for
    the r register.  The machinery was removed; see
    docs/performance.md.)"""
    g = num_ghost
    num_eqn = qbc.shape[0]
    if prepadded_interior is not None:
        nx, ny = prepadded_interior
        nxg, nyg = nx + 2 * g, ny + 2 * g
    else:
        _, nxg, nyg = qbc.shape
        nx, ny = nxg - 2 * g, nyg - 2 * g
    tm = tile_rows
    if nx % tm or tm % 8:
        raise ValueError(
            f"dq_pallas_rows: tile_rows={tm} must be a multiple of 8 "
            f"and divide the interior rows ({nx})")
    if ny % 128:
        raise ValueError(
            f"dq_pallas_rows: interior width ({ny}) must be a multiple "
            f"of 128 (Mosaic output-block lane alignment)")
    fetch = tm + 2 * g + (-(tm + 2 * g)) % 8
    pad_rows = max(0, (nx - tm + fetch) - nxg)
    pad_lanes = (-nyg) % 128
    if prepadded_interior is not None:
        assert (qbc.shape[1] >= nxg + pad_rows
                and qbc.shape[2] == nyg + pad_lanes), \
            (qbc.shape, (nxg + pad_rows, nyg + pad_lanes))
    else:
        qbc = jnp.pad(qbc, ((0, 0), (0, pad_rows), (0, pad_lanes)))
    lanes = nyg + pad_lanes
    grid = (nx // tm,)

    from ..sharpclaw import soa as sc_soa

    nprog = grid[0]

    def kernel(dt_ref, q_hbm, out_ref, cfl_ref, slab0, slab1, sem0, sem1):
        # double-buffered input DMA, as in step2_pallas_rows
        from jax import lax as _lax
        i = pl.program_id(0)

        def issue(j, s, sm):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(j * tm, fetch)], s, sm).start()

        @pl.when(i == 0)
        def _():
            issue(0, slab0, sem0)

        @pl.when(i + 1 < nprog)
        def _():
            _lax.cond((i + 1) % 2 == 0,
                      lambda: issue(i + 1, slab0, sem0),
                      lambda: issue(i + 1, slab1, sem1))

        def waited(s, sm):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(i * tm, fetch)], s, sm).wait()
            return s[:, :tm + 2 * g, :]
        sub = _lax.cond(i % 2 == 0,
                        lambda: waited(slab0, sem0),
                        lambda: waited(slab1, sem1))

        def roll_tpu(a, shift, axis):
            return pltpu.roll(a, jnp.int32(shift % a.shape[axis]), axis)
        dq, cfl = sc_soa.dq_2d_soa_roll(
            sub, dt_ref[0], dx, dy, rpn_soa, params, weno_order, g,
            positivity=positivity, flux_soa=flux_soa, roll=roll_tpu,
            cfl_shape=(tm + 2 * g, nyg))
        out_ref[...] = dq[:, :, :ny]
        cfl_ref[i] = cfl

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [pltpu.VMEM((num_eqn, fetch, lanes), qbc.dtype),
               pltpu.VMEM((num_eqn, fetch, lanes), qbc.dtype),
               pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    args = [jnp.asarray(dt, qbc.dtype).reshape(1), qbc]

    kw = {}
    if vmem_limit_mb is not None and not _interpret():
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    from . import mosaic_ctx
    with mosaic_ctx(qbc.dtype):
        dq_out, cfl_tiles = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((num_eqn, tm, ny),
                                    lambda i: (0, i, 0)),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((num_eqn, nx, ny), qbc.dtype),
                       jax.ShapeDtypeStruct(grid, qbc.dtype)),
            scratch_shapes=scratch,
            interpret=_interpret(),
            **kw,
        )(*args)
    return dq_out, jnp.max(cfl_tiles)


def step3_pallas_xy(qbc, dt, dx, dy, dz, rp, rpt, rptt, params, mthlim,
                    order, num_ghost, transverse_waves=2, prefactor=None,
                    tile=(8, 8), vmem_limit_mb=None,
                    prepadded_interior=None, auxbc=None, fwave=False,
                    index_capa=-1):
    """(x, y)-tiled fused classic 3D step (full Langseth-LeVeque corner
    transport) — the Pallas analog of kernels.step3_tiled with the
    Mosaic-legal geometry of :func:`step2_pallas_rows`:

      * the x axis (dim 1, untiled in the (8,128) layout) is sliced
        freely: DMA exactly tile_x + 2g rows, no over-fetch;
      * the y axis (dim 2, sublane) uses 8-aligned over-fetch DMAs
        (tile_y multiple of 8, fetch = tile_y + 8 for g = 2);
      * the z axis (dim 3, lane) rides whole, padded to a 128-multiple
        with dead cells the roll body's clipping and real-extent CFL
        windows never read;
      * the body is :func:`kernels.step3_roll` (shape-uniform roll form,
        bit-identical to step3) on the (ne, tx+2g, ty+2g, z) sub-slab.

    Covers wave-form systems with or without aux, capacity functions
    (per-cell dtdx — capa rides in the aux slab; its dead-lane padding
    garbage stays outside the interior/CFL windows like all roll-wrap
    garbage) and fwave.  qbc (num_eqn, nx, ny, nz) ghost-padded ->
    (q interior, cfl).
    ``prepadded_interior``: as in :func:`step2_pallas_rows`."""
    g = num_ghost
    num_eqn = qbc.shape[0]
    if prepadded_interior is not None:
        nx, ny, nz = prepadded_interior
        nxg, nyg, nzg = nx + 2 * g, ny + 2 * g, nz + 2 * g
    else:
        _, nxg, nyg, nzg = qbc.shape
        nx, ny, nz = nxg - 2 * g, nyg - 2 * g, nzg - 2 * g
    tx, ty = tile
    if nx % tx or ny % ty or ty % 8:
        raise ValueError(
            f"step3_pallas_xy: tile {tile} must divide the interior "
            f"({nx},{ny}) with tile_y a multiple of 8")
    fetch_y = ty + 2 * g + (-(ty + 2 * g)) % 8
    pad_y = max(0, (ny - ty + fetch_y) - nyg)
    pad_z = (-nzg) % 128
    if prepadded_interior is not None:
        assert (qbc.shape[2] >= nyg + pad_y
                and qbc.shape[3] == nzg + pad_z), \
            (qbc.shape, (nyg + pad_y, nzg + pad_z))
    else:
        qbc = jnp.pad(qbc, ((0, 0), (0, 0), (0, pad_y), (0, pad_z)))
    lanes = nzg + pad_z
    grid = (nx // tx, ny // ty)
    has_aux = auxbc is not None
    if has_aux:
        auxbc = jnp.pad(auxbc, ((0, 0), (0, 0), (0, pad_y), (0, pad_z)))
        num_aux = auxbc.shape[0]

    from ..classic import kernels as ck

    gx, gy = grid
    nprog = gx * gy

    def kernel_aux(dt_ref, q_hbm, aux_hbm, out_ref, cfl_ref,
                   slab, aslab, sem, asem):
        # blocking form with an aux slab (aux-carrying wave-form
        # systems, e.g. 3D heterogeneous acoustics)
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(i * tx, tx + 2 * g),
                     pl.ds(j * ty, fetch_y)], slab, sem)
        dma.start()
        adma = pltpu.make_async_copy(
            aux_hbm.at[:, pl.ds(i * tx, tx + 2 * g),
                       pl.ds(j * ty, fetch_y)], aslab, asem)
        adma.start()
        adma.wait()
        dma.wait()
        sub = slab[:, :, :ty + 2 * g, :]
        asub = aslab[:, :, :ty + 2 * g, :]

        def roll_tpu(a, shift, axis):
            return pltpu.roll(a, jnp.int32(shift % a.shape[axis]), axis)
        q_new, cfl = ck.step3_roll(
            sub, dt_ref[0], dx, dy, dz, rp, rpt, rptt, params, mthlim,
            order, g, transverse_waves=transverse_waves,
            prefactor=prefactor, roll=roll_tpu,
            cfl_shape=(tx + 2 * g, ty + 2 * g, nzg), aux=asub,
            fwave=fwave, index_capa=index_capa)
        out_ref[...] = q_new[:, :, :, :nz]
        cfl_ref[i, j] = cfl

    def kernel(dt_ref, q_hbm, out_ref, cfl_ref, slab0, slab1, sem0, sem1):
        # double-buffered input DMA over the row-major (i, j) grid, as
        # in step2_pallas_rows (the 3D tile DMAs ~2 MB against ~15 us
        # of compute — worth hiding)
        from jax import lax as _lax
        i = pl.program_id(0)
        j = pl.program_id(1)
        idx = i * gy + j

        def issue(i2, j2, s, sm):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(i2 * tx, tx + 2 * g),
                         pl.ds(j2 * ty, fetch_y)], s, sm).start()

        @pl.when(idx == 0)
        def _():
            issue(i, j, slab0, sem0)

        @pl.when(idx + 1 < nprog)
        def _():
            nidx = idx + 1
            i2, j2 = nidx // gy, nidx % gy
            _lax.cond(nidx % 2 == 0,
                      lambda: issue(i2, j2, slab0, sem0),
                      lambda: issue(i2, j2, slab1, sem1))

        def waited(s, sm):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(i * tx, tx + 2 * g),
                         pl.ds(j * ty, fetch_y)], s, sm).wait()
            return s[:, :, :ty + 2 * g, :]
        sub = _lax.cond(idx % 2 == 0,
                        lambda: waited(slab0, sem0),
                        lambda: waited(slab1, sem1))

        def roll_tpu(a, shift, axis):
            return pltpu.roll(a, jnp.int32(shift % a.shape[axis]), axis)
        q_new, cfl = ck.step3_roll(
            sub, dt_ref[0], dx, dy, dz, rp, rpt, rptt, params, mthlim,
            order, g, transverse_waves=transverse_waves,
            prefactor=prefactor, roll=roll_tpu,
            cfl_shape=(tx + 2 * g, ty + 2 * g, nzg), fwave=fwave)
        out_ref[...] = q_new[:, :, :, :nz]
        cfl_ref[i, j] = cfl

    kw = {}
    if vmem_limit_mb is not None and not _interpret():
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    from . import mosaic_ctx
    with mosaic_ctx(qbc.dtype):
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY)]
        args = [jnp.asarray(dt, qbc.dtype).reshape(1), qbc]
        if has_aux:
            kern = kernel_aux
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            scratch = [pltpu.VMEM((num_eqn, tx + 2 * g, fetch_y, lanes),
                                  qbc.dtype),
                       pltpu.VMEM((num_aux, tx + 2 * g, fetch_y, lanes),
                                  auxbc.dtype),
                       pltpu.SemaphoreType.DMA,
                       pltpu.SemaphoreType.DMA]
            args.append(auxbc)
        else:
            kern = kernel
            scratch = [pltpu.VMEM((num_eqn, tx + 2 * g, fetch_y, lanes),
                                  qbc.dtype),
                       pltpu.VMEM((num_eqn, tx + 2 * g, fetch_y, lanes),
                                  qbc.dtype),
                       pltpu.SemaphoreType.DMA,
                       pltpu.SemaphoreType.DMA]
        q_out, cfl_tiles = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((num_eqn, tx, ty, nz),
                                    lambda i, j: (0, i, j, 0)),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((num_eqn, nx, ny, nz),
                                            qbc.dtype),
                       jax.ShapeDtypeStruct(grid, qbc.dtype)),
            scratch_shapes=scratch,
            interpret=_interpret(),
            **kw,
        )(*args)
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
