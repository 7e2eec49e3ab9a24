"""SoA (struct-of-2D-arrays) fast path for the classic 2D unsplit step.

Performance rebuild of ``step2.f90 + flux2.f90`` (SURVEY.md §2.2) in the
dataflow XLA fuses best on TPU.  The generic kernel (`kernels.step2`)
carries an AoS wave tensor ``(num_eqn, num_waves, nx, ny)`` — profiling
the compiled step on a v5e (tools/hlo_traffic.py) shows that tensor is
materialized to HBM and re-read ~4x per sweep (limiter dot products,
correction flux, fluctuation sums), dominating step time.  Here every
wave component stays an independent 2D ``(nx, ny)`` value inside one
fused elementwise chain: XLA recomputes the cheap Roe algebra per
consumer instead of spilling 67 MB tensors (measured ~1.9x on the
x-sweep alone by a round-2 prototype harness; the production-step
numbers in docs/performance.md supersede it).

Protocol (per Riemann solver, attached to the registry record):

    rpn_soa(ixy, qs_l, qs_r, params) -> (waves, speeds)
        qs_l/qs_r : tuple over equations of 2D interface-side arrays
        waves     : tuple over waves p of tuples over equations e of
                    2D arrays (or None for identically-zero components)
        speeds    : tuple over p of 2D arrays OR weak-typed scalars
    rpt_soa(ixy, imp, qs_l, qs_r, asdq, params) -> (bm, bp)
        asdq      : tuple over e of 2D arrays; returns two such tuples

Fluctuations are combined generically (Godunov: amdq = sum_p s_p^- W_p),
so entropy-fix solvers with custom amdq stay on the generic kernel.
Numerics are identical to kernels.step2 (same index algebra, same
limiter semantics) — pinned by tests/test_soa.py equality oracles and
the shared golden suite.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..limiters import tvd


def _lo(a, axis):
    return a[:-1] if axis == 0 else a[:, :-1]


def _hi(a, axis):
    return a[1:] if axis == 0 else a[:, 1:]


def _pad(a, axis, before, after):
    pads = [(0, 0), (0, 0)]
    pads[axis] = (before, after)
    return jnp.pad(a, pads)


def _phi_soa(comps, s, lid, dtdx, axis):
    """Limiter factor for ONE wave family — same semantics as
    tvd.limiter_phi (upwind dot-product theta, phi=1 where the wave
    vanishes, theta=0 at end interfaces)."""
    live = [c for c in comps if c is not None]
    wn2 = sum(c * c for c in live)
    d = sum(_lo(c, axis) * _hi(c, axis) for c in live)
    z = jnp.zeros_like(d[:1] if axis == 0 else d[:, :1])
    dot_r = jnp.concatenate([d, z], axis=axis)
    dot_l = jnp.concatenate([z, d], axis=axis)
    dotu = jnp.where(s > 0.0, dot_l, dot_r)
    safe = wn2 > 0.0
    theta = jnp.where(safe, dotu / jnp.where(safe, wn2, 1.0), 0.0)
    if int(lid) in tvd.CFL_LIMITER_IDS:
        phi = tvd._phi_cfl(int(lid), theta, jnp.abs(s) * dtdx)
    else:
        phi = tvd._phi(int(lid), theta)
    return jnp.where(safe, phi, 1.0)


def _sweep_soa(qs, axis, rpn_soa, params, mthlim, order, dtdx):
    """Normal sweep along `axis` of the 2D component arrays.

    Returns (amdq, apdq, cq, smax) — per-equation 2D lists at interfaces
    (length n-1 along `axis`), plus the per-wave speed list for CFL."""
    ne = len(qs)
    ql = tuple(_lo(c, axis) for c in qs)
    qr = tuple(_hi(c, axis) for c in qs)
    waves, speeds = rpn_soa(axis, ql, qr, params)
    nw = len(waves)

    phis = [None] * nw
    if order == 2:
        for p in range(nw):
            lid = mthlim[p] if p < len(mthlim) else mthlim[-1]
            if lid != 0:
                phis[p] = _phi_soa(waves[p], speeds[p], lid, dtdx, axis)

    amdq, apdq, cq = [], [], []
    for e in range(ne):
        am = ap = c = None
        for p in range(nw):
            w = waves[p][e]
            if w is None:
                continue
            sp = speeds[p]
            am_t = jnp.minimum(sp, 0.0) * w
            ap_t = jnp.maximum(sp, 0.0) * w
            am = am_t if am is None else am + am_t
            ap = ap_t if ap is None else ap + ap_t
            if order == 2:
                absp = jnp.abs(sp)
                coef = 0.5 * absp * (1.0 - absp * dtdx)
                c_t = coef * w if phis[p] is None else coef * phis[p] * w
                c = c_t if c is None else c + c_t
        zero = jnp.zeros_like(ql[0])
        amdq.append(am if am is not None else zero)
        apdq.append(ap if ap is not None else zero)
        cq.append((c if c is not None else zero) if order == 2 else None)
    return amdq, apdq, cq, speeds


def _abs_max(s, sl):
    if jnp.ndim(s) == 0:
        return jnp.abs(s)
    return jnp.max(jnp.abs(s[sl]))


def step2_soa(q, dt, dx, dy, rpn_soa, rpt_soa, params, mthlim, order,
              num_ghost, transverse_waves=2, prefactor_soa=None):
    """2D unsplit classic step, SoA dataflow.  Same contract as
    kernels.step2 restricted to aux=None / no capacity function:
    q (num_eqn, nx, ny) ghost-padded -> (q_interior, cfl)."""
    g = num_ghost
    num_eqn, nx, ny = q.shape
    dtdx = dt / dx
    dtdy = dt / dy
    qs = tuple(q[e] for e in range(num_eqn))

    amdqx, apdqx, cqxx, sx = _sweep_soa(qs, 0, rpn_soa, params, mthlim,
                                        order, dtdx)
    amdqy, apdqy, cqyy, sy = _sweep_soa(qs, 1, rpn_soa, params, mthlim,
                                        order, dtdy)

    # CFL over interfaces touching the interior (same slices as step2)
    from functools import reduce
    slx = (slice(g - 1, nx - g), slice(g, ny - g))
    sly = (slice(g, nx - g), slice(g - 1, ny - g))
    cflx = dtdx * reduce(jnp.maximum, (_abs_max(s, slx) for s in sx))
    cfly = dtdy * reduce(jnp.maximum, (_abs_max(s, sly) for s in sy))
    cfl = jnp.maximum(cflx, cfly)

    # NOTE list() copies: the transverse loops mutate Fx/Gy in place and
    # the y-side fold must still read the ORIGINAL cqyy
    Fx = list(cqxx) if order == 2 else [jnp.zeros_like(a) for a in amdqx]
    Gy = list(cqyy) if order == 2 else [jnp.zeros_like(a) for a in amdqy]

    if rpt_soa is not None and transverse_waves > 0:
        qx_l = tuple(_lo(c, 0) for c in qs)
        qx_r = tuple(_hi(c, 0) for c in qs)
        if transverse_waves >= 2 and order == 2:
            am_x = [a + c for a, c in zip(amdqx, cqxx)]
            ap_x = [a - c for a, c in zip(apdqx, cqxx)]
        else:
            am_x, ap_x = amdqx, apdqx
        # shared per-direction eigensystem (RiemannSolver.prefactor_soa)
        kwx = {} if prefactor_soa is None else {
            "eig": prefactor_soa(0, qx_l, qx_r, params)}
        bm_am, bp_am = rpt_soa(0, 1, qx_l, qx_r, tuple(am_x), params, **kwx)
        bm_ap, bp_ap = rpt_soa(0, 2, qx_l, qx_r, tuple(ap_x), params, **kwx)

        # x-interface k feeds Gy rows k (A- parts) / k+1 (A+ parts);
        # below-going from source cell j>=1 -> Gy col j-1, above-going
        # from j<=ny-2 -> col j (same algebra as kernels.step2).
        half_dtdx = 0.5 * dtdx
        for e in range(num_eqn):
            blk0 = half_dtdx * (bm_am[e][:, 1:] + bp_am[e][:, :-1])
            blk1 = half_dtdx * (bm_ap[e][:, 1:] + bp_ap[e][:, :-1])
            Gy[e] = Gy[e] - _pad(blk0, 0, 0, 1) - _pad(blk1, 0, 1, 0)

        qy_l = tuple(_lo(c, 1) for c in qs)
        qy_r = tuple(_hi(c, 1) for c in qs)
        if transverse_waves >= 2 and order == 2:
            am_y = [a + c for a, c in zip(amdqy, cqyy)]
            ap_y = [a - c for a, c in zip(apdqy, cqyy)]
        else:
            am_y, ap_y = amdqy, apdqy
        kwy = {} if prefactor_soa is None else {
            "eig": prefactor_soa(1, qy_l, qy_r, params)}
        am_bm, ap_bm = rpt_soa(1, 1, qy_l, qy_r, tuple(am_y), params, **kwy)
        am_bp, ap_bp = rpt_soa(1, 2, qy_l, qy_r, tuple(ap_y), params, **kwy)

        half_dtdy = 0.5 * dtdy
        for e in range(num_eqn):
            blk0 = half_dtdy * (am_bm[e][1:, :] + ap_bm[e][:-1, :])
            blk1 = half_dtdy * (am_bp[e][1:, :] + ap_bp[e][:-1, :])
            Fx[e] = Fx[e] - _pad(blk0, 1, 0, 1) - _pad(blk1, 1, 1, 0)

    out = []
    for e in range(num_eqn):
        dq = (apdqx[e][:-1, 1:-1] + amdqx[e][1:, 1:-1]
              + Fx[e][1:, 1:-1] - Fx[e][:-1, 1:-1]) * dtdx \
            + (apdqy[e][1:-1, :-1] + amdqy[e][1:-1, 1:]
               + Gy[e][1:-1, 1:] - Gy[e][1:-1, :-1]) * dtdy
        out.append(qs[e][1:-1, 1:-1] - dq)
    q_new = jnp.stack(out)
    return q_new[:, g - 1:nx - 1 - g, g - 1:ny - 1 - g], cfl


def step2_soa_roll(q, dt, dx, dy, rpn_soa, rpt_soa, params, mthlim, order,
                   num_ghost, transverse_waves=2, prefactor_soa=None,
                   roll=jnp.roll, cfl_shape=None):
    """Shape-uniform variant of :func:`step2_soa` for the Pallas/Mosaic
    backend (round 5).

    Mosaic cannot legalize the pad/concatenate ops the XLA-tuned body
    uses for interface-array assembly ("result/input offset mismatch on
    non-concat dimension"), so this form keeps EVERY intermediate at the
    full slab shape (num_eqn, R, C): interface quantity k lives at index
    k, neighbor access is a circular ``roll`` (``pltpu.roll`` on TPU —
    a native sublane/lane rotate), and the entries where the XLA form
    had zero padding hold wrapped-around garbage instead.  The garbage
    stays out of the result: it occupies rows/cols {0, 1, R-2, R-1}
    at most (each roll moves it one step; the longest chain is
    wave -> limiter dot -> cqxx -> transverse split -> flux fold, four
    shifts), and the returned interior window [g, R-g) x [g, C-g) with
    g = 2 never reads those — interior values are bit-identical to
    step2_soa (tests/test_soa.py pins it).

    Same contract as step2_soa; ``roll(a, shift, axis)`` must implement
    jnp.roll semantics.  ``cfl_shape``: the REAL (rows, cols) extent of
    q when the caller padded it for DMA alignment (ops/tiled2d.py) —
    the CFL reduction windows use it so inf/nan speeds from the dead
    zero-filled cells never enter the max."""
    g = num_ghost
    num_eqn, nx, ny = q.shape
    nxr, nyr = cfl_shape if cfl_shape is not None else (nx, ny)
    dtdx = dt / dx
    dtdy = dt / dy
    qs = tuple(q[e] for e in range(num_eqn))

    def up(a, axis):      # up(a)[k] = a[k+1]
        return roll(a, -1, axis)

    def down(a, axis):    # down(a)[k] = a[k-1]
        return roll(a, 1, axis)

    def phi_roll(comps, s, lid, dtdx_, axis):
        # full-shape _phi_soa: dot_r[k] = <W_k, W_{k+1}>, dot_l[k] =
        # dot_r[k-1]; the end-interface theta=0 convention is replaced
        # by garbage that the interior window never consumes
        live = [c for c in comps if c is not None]
        wn2 = sum(c * c for c in live)
        d = sum(c * up(c, axis) for c in live)
        dotu = jnp.where(s > 0.0, down(d, axis), d)
        safe = wn2 > 0.0
        theta = jnp.where(safe, dotu / jnp.where(safe, wn2, 1.0), 0.0)
        if int(lid) in tvd.CFL_LIMITER_IDS:
            phi = tvd._phi_cfl(int(lid), theta, jnp.abs(s) * dtdx_)
        else:
            phi = tvd._phi(int(lid), theta)
        return jnp.where(safe, phi, 1.0)

    def sweep(axis, dtdx_):
        ql = qs
        qr = tuple(up(c, axis) for c in qs)
        waves, speeds = rpn_soa(axis, ql, qr, params)
        nw = len(waves)
        phis = [None] * nw
        if order == 2:
            for p in range(nw):
                lid = mthlim[p] if p < len(mthlim) else mthlim[-1]
                if lid != 0:
                    phis[p] = phi_roll(waves[p], speeds[p], lid, dtdx_,
                                       axis)
        amdq, apdq, cq = [], [], []
        for e in range(num_eqn):
            am = ap = c = None
            for p in range(nw):
                w = waves[p][e]
                if w is None:
                    continue
                sp = speeds[p]
                am_t = jnp.minimum(sp, 0.0) * w
                ap_t = jnp.maximum(sp, 0.0) * w
                am = am_t if am is None else am + am_t
                ap = ap_t if ap is None else ap + ap_t
                if order == 2:
                    absp = jnp.abs(sp)
                    coef = 0.5 * absp * (1.0 - absp * dtdx_)
                    c_t = coef * w if phis[p] is None \
                        else coef * phis[p] * w
                    c = c_t if c is None else c + c_t
            zero = jnp.zeros_like(qs[0])
            amdq.append(am if am is not None else zero)
            apdq.append(ap if ap is not None else zero)
            cq.append((c if c is not None else zero)
                      if order == 2 else None)
        return amdq, apdq, cq, speeds

    amdqx, apdqx, cqxx, sx = sweep(0, dtdx)
    amdqy, apdqy, cqyy, sy = sweep(1, dtdy)

    from functools import reduce
    slx = (slice(g - 1, nxr - g), slice(g, nyr - g))
    sly = (slice(g, nxr - g), slice(g - 1, nyr - g))
    cflx = dtdx * reduce(jnp.maximum, (_abs_max(s, slx) for s in sx))
    cfly = dtdy * reduce(jnp.maximum, (_abs_max(s, sly) for s in sy))
    cfl = jnp.maximum(cflx, cfly)

    Fx = list(cqxx) if order == 2 else [jnp.zeros_like(a) for a in amdqx]
    Gy = list(cqyy) if order == 2 else [jnp.zeros_like(a) for a in amdqy]

    if rpt_soa is not None and transverse_waves > 0:
        qx_l, qx_r = qs, tuple(up(c, 0) for c in qs)
        if transverse_waves >= 2 and order == 2:
            am_x = [a + c for a, c in zip(amdqx, cqxx)]
            ap_x = [a - c for a, c in zip(apdqx, cqxx)]
        else:
            am_x, ap_x = amdqx, apdqx
        kwx = {} if prefactor_soa is None else {
            "eig": prefactor_soa(0, qx_l, qx_r, params)}
        bm_am, bp_am = rpt_soa(0, 1, qx_l, qx_r, tuple(am_x), params, **kwx)
        bm_ap, bp_ap = rpt_soa(0, 2, qx_l, qx_r, tuple(ap_x), params, **kwx)
        half_dtdx = 0.5 * dtdx
        for e in range(num_eqn):
            blk0 = half_dtdx * (up(bm_am[e], 1) + bp_am[e])
            blk1 = half_dtdx * (up(bm_ap[e], 1) + bp_ap[e])
            Gy[e] = Gy[e] - blk0 - down(blk1, 0)

        qy_l, qy_r = qs, tuple(up(c, 1) for c in qs)
        if transverse_waves >= 2 and order == 2:
            am_y = [a + c for a, c in zip(amdqy, cqyy)]
            ap_y = [a - c for a, c in zip(apdqy, cqyy)]
        else:
            am_y, ap_y = amdqy, apdqy
        kwy = {} if prefactor_soa is None else {
            "eig": prefactor_soa(1, qy_l, qy_r, params)}
        am_bm, ap_bm = rpt_soa(1, 1, qy_l, qy_r, tuple(am_y), params, **kwy)
        am_bp, ap_bp = rpt_soa(1, 2, qy_l, qy_r, tuple(ap_y), params, **kwy)
        half_dtdy = 0.5 * dtdy
        for e in range(num_eqn):
            blk0 = half_dtdy * (up(am_bm[e], 0) + ap_bm[e])
            blk1 = half_dtdy * (up(am_bp[e], 0) + ap_bp[e])
            Fx[e] = Fx[e] - blk0 - down(blk1, 1)

    out = []
    for e in range(num_eqn):
        dq = (down(apdqx[e], 0) + amdqx[e]
              + Fx[e] - down(Fx[e], 0)) * dtdx \
            + (down(apdqy[e], 1) + amdqy[e]
               + Gy[e] - down(Gy[e], 1)) * dtdy
        out.append(qs[e] - dq)
    q_new = jnp.stack(out)
    return q_new[:, g:nx - g, g:ny - g], cfl


def step2_soa_tiled(q, dt, dx, dy, rpn_soa, rpt_soa, params, mthlim, order,
                    num_ghost, transverse_waves=2, tile_rows=128,
                    prefactor_soa=None):
    """Row-tiled driver around :func:`step2_soa` — the pure-XLA analog of
    the Pallas halo-apron kernel (ops/tiled2d.py), and the production TPU
    fast path.

    The monolithic step materializes ~115 full-grid planes; XLA's
    memory-space assignment can only keep a fraction of 0.5 GB of
    intermediates in VMEM, so most planes round-trip HBM.  Slicing the
    interior into row blocks of ``tile_rows`` (+``num_ghost`` apron each
    side, recomputed per tile exactly like the reference's per-slice
    flux2 workspaces) shrinks every intermediate to ~(tile+2g, ny) —
    small enough that the whole per-tile dataflow lives in VMEM and HBM
    traffic approaches the q-in/q-out minimum.  ``lax.map`` sequences the
    tiles through one compiled body.  Measured 1.7x over the monolithic
    step at 1024^2 f32 on a v5e (tile=128), bit-identical results.

    Falls back to the monolithic step when the interior rows don't
    divide (e.g. the 3g-wide boundary bands of the halo-overlap path).
    """
    from jax import lax

    g = num_ghost
    num_eqn, nx, ny = q.shape
    rows = nx - 2 * g
    from .kernels import auto_tile
    tile_rows = auto_tile(rows, tile_rows)
    if tile_rows is None:
        return step2_soa(q, dt, dx, dy, rpn_soa, rpt_soa, params, mthlim,
                         order, num_ghost, transverse_waves, prefactor_soa)
    nt = rows // tile_rows

    def body(s):
        blk = lax.dynamic_slice(q, (0, s, 0),
                                (num_eqn, tile_rows + 2 * g, ny))
        return step2_soa(blk, dt, dx, dy, rpn_soa, rpt_soa, params,
                         mthlim, order, num_ghost, transverse_waves,
                         prefactor_soa)

    outs, cfls = lax.map(body, jnp.arange(nt) * tile_rows)
    q_new = jnp.moveaxis(outs, 0, 1).reshape(num_eqn, rows, ny - 2 * g)
    return q_new, jnp.max(cfls)
