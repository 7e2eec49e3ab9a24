"""Classic (Clawpack 4.x) sweep kernels — pure-XLA reference backend.

TPU-native equivalents of the reference Fortran kernels (SURVEY.md §2.2):

  step1      <- src/pyclaw/classic/step1.f90      (:~1-160)
  step2      <- src/pyclaw/classic/step2.f90      (:~1-250) + flux2.f90
  step2ds    <- src/pyclaw/classic/step2ds.f90    (:~1-200)
  step3/3ds  <- src/pyclaw/classic/step3*.f90     + flux3.f90
  limiter    <- src/pyclaw/classic/limiter.f90    (via pyclaw_tpu.limiters.tvd)

Instead of per-interface Fortran loops with rp callbacks, every kernel calls
the Riemann solver ONCE on whole interface arrays and assembles the update
with shifted slices — XLA fuses {rp, limiter, correction, update} into a
single elementwise program over the grid (all VPU work).  The fused Pallas
versions live in pyclaw_tpu.ops; results must agree to roundoff (the
dual-backend oracle, SURVEY.md §4).

Index conventions (1D sweep over the last axis, length n = mx + 2*g):
  interface k in [0, n-2] separates cells k and k+1;
  cell i update uses apdq at its left interface (k=i-1) and amdq at its
  right interface (k=i).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..limiters import tvd


def _dtdx_arr(dt, dxi, capa, n, dtype):
    """dt/(dx*kappa) per cell along the sweep axis (broadcastable)."""
    if capa is None:
        return jnp.full((n,), dt / dxi, dtype=dtype)
    return dt / (dxi * capa)


def _correction_flux(wave, phi, s, dtdxave, fwave):
    """Second-order correction flux at each interface:
    cqxx = sum_p 0.5 |s^p| (1 - |s^p| dt/dx) W~^p    (wave form)
    cqxx = sum_p 0.5 sign(s^p) (1 - |s^p| dt/dx) Z~^p (f-wave form)
    with W~^p = phi^p W^p.  The limiter factor phi is folded into the
    per-wave coefficient so the limited wave tensor (the biggest array in
    the hot path) is never materialized — the multiply + small-axis sum
    fuses with the raw rp output on the VPU (an einsum here lowers to a
    per-point 4x4 dot_general that XLA pads onto the MXU: ~10x slower)."""
    abss = jnp.abs(s)
    if fwave:
        coef = 0.5 * jnp.sign(s) * (1.0 - abss * dtdxave)
    else:
        coef = 0.5 * abss * (1.0 - abss * dtdxave)
    return jnp.sum((coef * phi)[None] * wave, axis=1)


def step1(q, aux, dt, dx, rp, params, mthlim, order, fwave, index_capa,
          num_ghost, ixy=0):
    """1D classic sweep along the LAST axis of ghost-padded arrays.

    q: (num_eqn, ..., n) with n = mx + 2*num_ghost (ghosts filled).  Any
    intermediate axes (pencil batches for 2D/3D dimensional splitting)
    broadcast through.  Returns (q with last axis reduced to interior mx,
    cfl scalar over interior interfaces).
    """
    g = num_ghost
    n = q.shape[-1]
    num_eqn = q.shape[0]

    q_l, q_r = q[..., :-1], q[..., 1:]
    if aux is not None:
        aux_l, aux_r = aux[..., :-1], aux[..., 1:]
    else:
        aux_l = aux_r = None

    wave, s, amdq, apdq = rp(ixy, q_l, q_r, aux_l, aux_r, params)

    capa = aux[index_capa] if index_capa >= 0 else None
    dtdx = _dtdx_arr(dt, dx, capa, n, q.dtype)

    # CFL over interfaces that touch interior cells
    s_int = s[..., g - 1:n - g]
    dtdx_r = dtdx[..., g:n - g + 1]
    dtdx_l = dtdx[..., g - 1:n - g]
    cfl = jnp.max(jnp.maximum(s_int * dtdx_r, -s_int * dtdx_l))

    # first-order fluctuation update for cells 1..n-2
    dq1 = apdq[..., :-1] + amdq[..., 1:]
    q_new = q[..., 1:-1] - dtdx[..., 1:-1] * dq1

    if order == 2:
        dtdxave = 0.5 * (dtdx[..., :-1] + dtdx[..., 1:])
        phi = tvd.limiter_phi(num_eqn, wave, s, mthlim, dtdx=dtdxave)
        cqxx = _correction_flux(wave, phi, s, dtdxave, fwave)
        q_new = q_new - dtdx[..., 1:-1] * (cqxx[..., 1:] - cqxx[..., :-1])

    # q_new covers cells 1..n-2; interior cells are g..n-1-g
    return q_new[..., g - 1:n - 1 - g], cfl


def step1_dir(q, aux, dt, dxi, ixy, rp, params, mthlim, order, fwave,
              index_capa, num_ghost):
    """Dimensionally-split single-direction sweep (step2ds.f90 /
    step3ds.f90 equivalent): apply the 1D sweep along spatial axis `ixy`
    of a fully ghost-padded N-D array, then strip the ghost bands of ALL
    axes.  Returns (q_interior, cfl)."""
    g = num_ghost
    axis = 1 + ixy
    num_dim = q.ndim - 1

    qm = jnp.moveaxis(q, axis, -1)
    auxm = None if aux is None else jnp.moveaxis(aux, axis, -1)
    q_new, cfl = step1(qm, auxm, dt, dxi, rp, params, mthlim, order, fwave,
                       index_capa, g, ixy=ixy)
    q_new = jnp.moveaxis(q_new, -1, axis)
    # strip ghosts on the other axes
    sl = [slice(None)] * q_new.ndim
    for d in range(num_dim):
        if d != ixy:
            sl[1 + d] = slice(g, q_new.shape[1 + d] - g)
    return q_new[tuple(sl)], cfl


# ======================================================================
# 2D unsplit (step2 + flux2 with corner-transport-upwind transverse terms)
# ======================================================================
def _sweep_normal(q, aux, ixy, rp, params, mthlim, order, fwave, dtdx_cells):
    """Normal Riemann sweep along axis `ixy` of a 2D/3D ghost-padded array.

    Computes fluctuations and the limited second-order correction flux at
    every interface along that axis.  Arrays are full-grid; the interface
    axis has length n-1 relative to the cell axis.

    Returns (wave, s, amdq, apdq, cqxx, dtdxave) where cqxx is None for
    order 1.  All shaped with the interface axis in place of the cell axis.
    """
    axis = 1 + ixy

    def lo(a):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, a.shape[axis] - 1)
        return a[tuple(sl)]

    def hi(a):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(1, a.shape[axis])
        return a[tuple(sl)]

    q_l, q_r = lo(q), hi(q)
    aux_l = aux_r = None
    if aux is not None:
        aux_l, aux_r = lo(aux), hi(aux)

    wave, s, amdq, apdq = rp(ixy, q_l, q_r, aux_l, aux_r, params)

    cqxx = None
    dtdxave = None
    if order == 2:
        num_eqn = q.shape[0]
        if jnp.ndim(dtdx_cells) == 0:
            dtdxave = dtdx_cells
        else:
            dtdxave = 0.5 * (lo(dtdx_cells[None])[0] + hi(dtdx_cells[None])[0])
        # limiter compares along the interface axis, addressed negatively
        # so no transpose of the wave tensor is ever needed
        neg_axis = axis - q.ndim
        phi = tvd.limiter_phi(num_eqn, wave, s, mthlim, dtdx=dtdxave,
                              axis=neg_axis)
        cqxx = _correction_flux(wave, phi, s, dtdxave, fwave)
    return wave, s, amdq, apdq, cqxx, dtdxave


def _pad_axis(a, axis, before, after):
    pads = [(0, 0)] * a.ndim
    pads[axis] = (before, after)
    return jnp.pad(a, pads)


def step2(q, aux, dt, dx, dy, rp, rpt, params, mthlim, order, fwave,
          index_capa, num_ghost, transverse_waves=2, prefactor=None):
    """2D unsplit classic step (step2.f90 + flux2.f90 equivalent).

    q: (num_eqn, nx, ny) ghost-padded.  Two-pass structure (SURVEY.md §7
    "hard parts"): normal fluctuations and correction fluxes are
    materialized as full-grid arrays, then the transverse pass adds
    corner-transport corrections into the orthogonal flux arrays as
    zero-padded shifted slices (lax.pad fuses; a scatter-add here
    serializes on TPU).  Without a capacity function dt/dx stays a SCALAR
    all the way through — no full-grid coefficient arrays.

    transverse_waves (reference flux2.f90 method(3)):
      0 = no transverse propagation (donor-cell corners),
      1 = transverse transport of first-order fluctuations (CTU),
      2 = additionally transport the second-order correction waves: cqxx
          is folded into A±ΔQ before the rpt split (flux2.f90 folds cqxx
          into amdq/apdq when method(2)>1 and method(3)==2).

    Returns (q_interior, cfl).
    """
    g = num_ghost
    num_eqn, nx, ny = q.shape

    capa = aux[index_capa] if index_capa >= 0 else None
    if capa is None:
        dtdx = dt / dx          # scalar: XLA folds the broadcast into
        dtdy = dt / dy          # every consumer, zero HBM coefficient IO
    else:
        dtdx = dt / (dx * capa)
        dtdy = dt / (dy * capa)

    # ---- x-direction normal sweep (interfaces along axis 1) ----------
    wx, sx, amdqx, apdqx, cqxx, _ = _sweep_normal(
        q, aux, 0, rp, params, mthlim, order, fwave, dtdx)
    # ---- y-direction normal sweep (interfaces along axis 2) ----------
    wy, sy, amdqy, apdqy, cqyy, _ = _sweep_normal(
        q, aux, 1, rp, params, mthlim, order, fwave, dtdy)

    # CFL (interfaces touching interior)
    sx_int = sx[:, g - 1:nx - g, g:ny - g]
    sy_int = sy[:, g:nx - g, g - 1:ny - g]
    if capa is None:
        cflx = dtdx * jnp.max(jnp.abs(sx_int))
        cfly = dtdy * jnp.max(jnp.abs(sy_int))
    else:
        cflx = jnp.max(jnp.maximum(
            sx_int * dtdx[None, g:nx - g + 1, g:ny - g],
            -sx_int * dtdx[None, g - 1:nx - g, g:ny - g]))
        cfly = jnp.max(jnp.maximum(
            sy_int * dtdy[None, g:nx - g, g:ny - g + 1],
            -sy_int * dtdy[None, g:nx - g, g - 1:ny - g]))
    cfl = jnp.maximum(cflx, cfly)

    # ---- second-order correction fluxes ------------------------------
    # F~ at x-interfaces (num_eqn, nx-1, ny); G~ at y-interfaces
    Fx = cqxx if cqxx is not None else jnp.zeros_like(amdqx)
    Gy = cqyy if cqyy is not None else jnp.zeros_like(amdqy)

    # ---- transverse pass (corner transport upwind) -------------------
    if rpt is not None and transverse_waves > 0:
        def lo(a, axis):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(0, a.shape[axis] - 1)
            return a[tuple(sl)]

        def hi(a, axis):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(1, a.shape[axis])
            return a[tuple(sl)]

        # option 2: transverse-transport the correction waves too
        if transverse_waves >= 2 and cqxx is not None:
            amdqx_t, apdqx_t = amdqx + cqxx, apdqx - cqxx
        else:
            amdqx_t, apdqx_t = amdqx, apdqx

        qx_l, qx_r = lo(q, 1), hi(q, 1)
        auxx_l = auxx_r = None
        if aux is not None:
            auxx_l, auxx_r = lo(aux, 1), hi(aux, 1)

        # shared per-direction eigensystem (RiemannSolver.prefactor):
        # both imp splits below use the same Roe averages
        kwx = {} if prefactor is None else {
            "eig": prefactor(0, qx_l, qx_r, auxx_l, auxx_r, params)}

        # Split A-ΔQ and A+ΔQ into up/down-going parts.
        bm_am, bp_am = rpt(0, 1, qx_l, qx_r, auxx_l, auxx_r, amdqx_t,
                           params, **kwx)
        bm_ap, bp_ap = rpt(0, 2, qx_l, qx_r, auxx_l, auxx_r, apdqx_t,
                           params, **kwx)

        # G~_{i-1, j-1/2} -= dt/(2 dx κ) B-A-ΔQ_{i-1/2,j}
        # G~_{i-1, j+1/2} -= dt/(2 dx κ) B+A-ΔQ_{i-1/2,j}
        # G~_{i,   j-1/2} -= dt/(2 dx κ) B-A+ΔQ_{i-1/2,j}
        # G~_{i,   j+1/2} -= dt/(2 dx κ) B+A+ΔQ_{i-1/2,j}
        # κ is the capacity of the receiving cell (i1, j) — reference
        # flux2.f90 uses dtdx1d(i1) = dtdx/aux(i1,j,mcapa) in the gadd
        # updates.  Gy has shape (num_eqn, nx, ny-1): entry (i, jint) =
        # G~_{i, jint+1/2}.  x-interface k (0..nx-2) lies between cells k
        # (i-1 role) and k+1 (i).  Target rows i = k + i0 (i0: 0 = left
        # cell for the A- parts, 1 = right cell for A+): instead of a
        # scatter, the (num_eqn, nx-1, ny-1) contribution block is
        # zero-padded by one row at the far (i0=0) / near (i0=1) end.
        def transverse_contrib(bm, bp, i0):
            # bm, bp: (num_eqn, nx-1, ny) at (x-interface k, source cell j)
            # below-going: source j in [1, ny-1] -> Gy row j-1
            # above-going: source j in [0, ny-2] -> Gy row j
            if capa is None:
                c_lo = c_hi = 0.5 * dtdx
            else:   # per-receiving-cell coefficient (rows match the source)
                nxm1 = bm.shape[1]
                c_lo = 0.5 * dtdx[None, i0:i0 + nxm1, 1:]
                c_hi = 0.5 * dtdx[None, i0:i0 + nxm1, :-1]
            block = c_lo * bm[:, :, 1:] + c_hi * bp[:, :, :-1]
            return _pad_axis(block, 1, i0, 1 - i0)

        Gy = Gy - transverse_contrib(bm_am, bp_am, 0) \
                - transverse_contrib(bm_ap, bp_ap, 1)

        # y-sweep transverse: split B±ΔQ into left/right-going, modify F~
        if transverse_waves >= 2 and cqyy is not None:
            amdqy_t, apdqy_t = amdqy + cqyy, apdqy - cqyy
        else:
            amdqy_t, apdqy_t = amdqy, apdqy

        qy_l, qy_r = lo(q, 2), hi(q, 2)
        auxy_l = auxy_r = None
        if aux is not None:
            auxy_l, auxy_r = lo(aux, 2), hi(aux, 2)
        kwy = {} if prefactor is None else {
            "eig": prefactor(1, qy_l, qy_r, auxy_l, auxy_r, params)}
        am_bm, ap_bm = rpt(1, 1, qy_l, qy_r, auxy_l, auxy_r, amdqy_t,
                           params, **kwy)
        am_bp, ap_bp = rpt(1, 2, qy_l, qy_r, auxy_l, auxy_r, apdqy_t,
                           params, **kwy)

        def transverse_contrib_y(am, ap, j0):
            if capa is None:
                c_lo = c_hi = 0.5 * dtdy
            else:
                nym1 = am.shape[2]
                c_lo = 0.5 * dtdy[None, 1:, j0:j0 + nym1]
                c_hi = 0.5 * dtdy[None, :-1, j0:j0 + nym1]
            block = c_lo * am[:, 1:, :] + c_hi * ap[:, :-1, :]
            return _pad_axis(block, 2, j0, 1 - j0)

        Fx = Fx - transverse_contrib_y(am_bm, ap_bm, 0) \
                - transverse_contrib_y(am_bp, ap_bp, 1)

    # ---- assemble update ---------------------------------------------
    # cells 1..nx-2 (x) and 1..ny-2 (y)
    qc = q[:, 1:-1, 1:-1]
    if capa is None:
        dtdx_c, dtdy_c = dtdx, dtdy
    else:
        dtdx_c, dtdy_c = dtdx[1:-1, 1:-1], dtdy[1:-1, 1:-1]

    dq = (apdqx[:, :-1, 1:-1] + amdqx[:, 1:, 1:-1]
          + Fx[:, 1:, 1:-1] - Fx[:, :-1, 1:-1]) * dtdx_c \
        + (apdqy[:, 1:-1, :-1] + amdqy[:, 1:-1, 1:]
           + Gy[:, 1:-1, 1:] - Gy[:, 1:-1, :-1]) * dtdy_c
    q_new = qc - dq

    return q_new[:, g - 1:nx - 1 - g, g - 1:ny - 1 - g], cfl


def step2_roll(q, aux, dt, dx, dy, rp, rpt, params, mthlim, order, fwave,
               index_capa, num_ghost, transverse_waves=2, prefactor=None,
               roll=jnp.roll, cfl_shape=None):
    """Shape-uniform roll form of the GENERIC :func:`step2` for the
    Pallas/Mosaic backend (round 5) — the aux/capacity/fwave-capable
    companion of ``soa.step2_soa_roll`` (see there and
    :func:`step3_roll` for the roll-form/garbage-containment rationale;
    the shift depth is the same <= 2 cells per axis per side, inside
    the g = 2 apron).  Interior values are bit-identical to step2 at
    matching accumulation order (tests/test_tiled_kernels.py).
    ``cfl_shape``: real (rows, cols) extents when the caller padded for
    DMA alignment."""
    g = num_ghost
    num_eqn, nx, ny = q.shape
    nxr, nyr = cfl_shape if cfl_shape is not None else (nx, ny)

    def up(a, axis, k=1):
        return roll(a, -k, a.ndim - 2 + axis)

    def down(a, axis, k=1):
        return roll(a, k, a.ndim - 2 + axis)

    capa = aux[index_capa] if index_capa >= 0 else None
    if capa is None:
        dtdx = dt / dx
        dtdy = dt / dy
    else:
        dtdx = dt / (dx * capa)
        dtdy = dt / (dy * capa)

    def sweep(ixy, dtdx_cells):
        q_l, q_r = q, up(q, ixy)
        aux_l = aux_r = None
        if aux is not None:
            aux_l, aux_r = aux, up(aux, ixy)
        wave, s, amdq, apdq = rp(ixy, q_l, q_r, aux_l, aux_r, params)
        cqxx = None
        dtdxave = None
        if order == 2:
            if jnp.ndim(dtdx_cells) == 0:
                dtdxave = dtdx_cells
            else:
                dtdxave = 0.5 * (dtdx_cells + up(dtdx_cells, ixy))
            # roll-form limiter_phi (dot_r[k] = <W_k, W_{k+1}>)
            num_waves = wave.shape[1]
            wnorm2 = jnp.sum(wave * wave, axis=0)
            ddot = jnp.sum(wave * up(wave, ixy), axis=0)
            dotu = jnp.where(s > 0.0, down(ddot, ixy), ddot)
            safe = wnorm2 > 0.0
            theta = jnp.where(safe,
                              dotu / jnp.where(safe, wnorm2, 1.0), 0.0)
            phis = []
            for p in range(num_waves):
                lid = mthlim[p] if p < len(mthlim) else mthlim[-1]
                if lid == 0:
                    phis.append(jnp.ones_like(theta[p]))
                else:
                    if int(lid) in tvd.CFL_LIMITER_IDS:
                        nu = jnp.abs(s[p]) * dtdxave
                        ph = tvd._phi_cfl(int(lid), theta[p], nu)
                    else:
                        ph = tvd._phi(int(lid), theta[p])
                    phis.append(jnp.where(safe[p], ph, 1.0))
            phi = jnp.stack(phis)
            cqxx = _correction_flux(wave, phi, s, dtdxave, fwave)
        return s, amdq, apdq, cqxx

    sx, amdqx, apdqx, cqxx = sweep(0, dtdx)
    sy, amdqy, apdqy, cqyy = sweep(1, dtdy)

    # CFL over interfaces touching the interior (real extents only)
    sx_int = sx[:, g - 1:nxr - g, g:nyr - g]
    sy_int = sy[:, g:nxr - g, g - 1:nyr - g]
    if capa is None:
        cflx = dtdx * jnp.max(jnp.abs(sx_int))
        cfly = dtdy * jnp.max(jnp.abs(sy_int))
    else:
        # NOTE: slice FIRST, then expand_dims — a combined
        # [None, slice, slice] index lowers to a gather, which Mosaic
        # cannot lower in-kernel
        dxu, dyu = up(dtdx, 0), up(dtdy, 1)

        def w(a, sl):
            return jnp.expand_dims(a[sl], 0)
        slx2 = (slice(g - 1, nxr - g), slice(g, nyr - g))
        sly2 = (slice(g, nxr - g), slice(g - 1, nyr - g))
        cflx = jnp.max(jnp.maximum(sx_int * w(dxu, slx2),
                                   -sx_int * w(dtdx, slx2)))
        cfly = jnp.max(jnp.maximum(sy_int * w(dyu, sly2),
                                   -sy_int * w(dtdy, sly2)))
    cfl = jnp.maximum(cflx, cfly)

    Fx = cqxx if cqxx is not None else jnp.zeros_like(amdqx)
    Gy = cqyy if cqyy is not None else jnp.zeros_like(amdqy)

    if rpt is not None and transverse_waves > 0:
        if transverse_waves >= 2 and cqxx is not None:
            amdqx_t, apdqx_t = amdqx + cqxx, apdqx - cqxx
        else:
            amdqx_t, apdqx_t = amdqx, apdqx
        qx_l, qx_r = q, up(q, 0)
        auxx_l = auxx_r = None
        if aux is not None:
            auxx_l, auxx_r = aux, up(aux, 0)
        kwx = {} if prefactor is None else {
            "eig": prefactor(0, qx_l, qx_r, auxx_l, auxx_r, params)}
        bm_am, bp_am = rpt(0, 1, qx_l, qx_r, auxx_l, auxx_r, amdqx_t,
                           params, **kwx)
        bm_ap, bp_ap = rpt(0, 2, qx_l, qx_r, auxx_l, auxx_r, apdqx_t,
                           params, **kwx)

        def contrib_x(bm, bp, i0):
            if capa is None:
                c_lo = c_hi = 0.5 * dtdx
            else:
                dd = up(dtdx, 0, i0) if i0 else dtdx
                c_lo = 0.5 * up(dd, 1)[None]
                c_hi = 0.5 * dd[None]
            block = c_lo * up(bm, 1) + c_hi * bp
            return down(block, 0, i0) if i0 else block

        Gy = Gy - contrib_x(bm_am, bp_am, 0) - contrib_x(bm_ap, bp_ap, 1)

        if transverse_waves >= 2 and cqyy is not None:
            amdqy_t, apdqy_t = amdqy + cqyy, apdqy - cqyy
        else:
            amdqy_t, apdqy_t = amdqy, apdqy
        qy_l, qy_r = q, up(q, 1)
        auxy_l = auxy_r = None
        if aux is not None:
            auxy_l, auxy_r = aux, up(aux, 1)
        kwy = {} if prefactor is None else {
            "eig": prefactor(1, qy_l, qy_r, auxy_l, auxy_r, params)}
        am_bm, ap_bm = rpt(1, 1, qy_l, qy_r, auxy_l, auxy_r, amdqy_t,
                           params, **kwy)
        am_bp, ap_bp = rpt(1, 2, qy_l, qy_r, auxy_l, auxy_r, apdqy_t,
                           params, **kwy)

        def contrib_y(am, ap, j0):
            if capa is None:
                c_lo = c_hi = 0.5 * dtdy
            else:
                dd = up(dtdy, 1, j0) if j0 else dtdy
                c_lo = 0.5 * up(dd, 0)[None]
                c_hi = 0.5 * dd[None]
            block = c_lo * up(am, 0) + c_hi * ap
            return down(block, 1, j0) if j0 else block

        Fx = Fx - contrib_y(am_bm, ap_bm, 0) - contrib_y(am_bp, ap_bp, 1)

    if capa is None:
        dtdx_c, dtdy_c = dtdx, dtdy
    else:
        dtdx_c, dtdy_c = dtdx, dtdy       # full-shape per-cell arrays

    dq = (down(apdqx, 0) + amdqx + Fx - down(Fx, 0)) * dtdx_c \
        + (down(apdqy, 1) + amdqy + Gy - down(Gy, 1)) * dtdy_c
    q_new = q - dq
    return q_new[:, g:nx - g, g:ny - g], cfl


# ======================================================================
# 3D unsplit (step3 + flux3 with pairwise transverse corner transport)
# ======================================================================
def _embed(v, like, starts):
    """Zero-pad ``v`` so it sits at offsets ``starts`` (dict axis->start,
    default 0) within an array shaped like ``like`` — the fusible
    replacement for scatter-add of a slice-aligned contribution (XLA
    turns jnp.pad into a pad op it fuses into the consumer; a
    dynamic-update-slice forces a full-array copy per call, which made
    the 3D transverse section ~300 read-modify-write passes/step)."""
    pads = []
    for ax in range(v.ndim):
        start = starts.get(ax, 0)
        pads.append((start, like.shape[ax] - start - v.shape[ax]))
    return jnp.pad(v, pads)


def _slc(a, axis, sl):
    idx = [slice(None)] * a.ndim
    idx[axis] = sl
    return a[tuple(idx)]


def _step3_sweeps(q, aux, dt, deltas, rp, params, mthlim, order, fwave,
                  index_capa, num_ghost):
    """Normal sweeps of the 3D step (the rpn3+limiter half of reference
    step3.f90/flux3.f90): per-direction fluctuations and limited
    corrections, plus the CFL reduction over interior interfaces.
    Returns (waves, dtdx_cells, capa, cfl) with
    waves[d] = (amdq, apdq, cqxx)."""
    g = num_ghost
    shape = q.shape[1:]

    capa = aux[index_capa] if index_capa >= 0 else None
    dtdx_cells = []
    for d in range(3):
        if capa is None:
            dtdx_cells.append(jnp.full(shape, dt / deltas[d], dtype=q.dtype))
        else:
            dtdx_cells.append(dt / (deltas[d] * capa))

    waves = {}
    cfl = None
    for d in range(3):
        w, s, amdq, apdq, cqxx, _ = _sweep_normal(
            q, aux, d, rp, params, mthlim, order, fwave, dtdx_cells[d])
        waves[d] = (amdq, apdq, cqxx)
        # CFL over interfaces touching interior cells
        axis = 1 + d
        n = shape[d]
        s_int = _slc(s, axis, slice(g - 1, n - g))
        # interior slices on the other axes
        for d2 in range(3):
            if d2 != d:
                s_int = _slc(s_int, 1 + d2, slice(g, shape[d2] - g))
        dt_r = _slc(dtdx_cells[d], 1 + d - 1, slice(g, n - g + 1))
        dt_l = _slc(dtdx_cells[d], 1 + d - 1, slice(g - 1, n - g))
        for d2 in range(3):
            if d2 != d:
                dt_r = _slc(dt_r, d2, slice(g, shape[d2] - g))
                dt_l = _slc(dt_l, d2, slice(g, shape[d2] - g))
        c = jnp.max(jnp.maximum(s_int * dt_r, -s_int * dt_l))
        cfl = c if cfl is None else jnp.maximum(cfl, c)
    return waves, dtdx_cells, capa, cfl


def step3(q, aux, dt, dx, dy, dz, rp, rpt, rptt, params, mthlim, order,
          fwave, index_capa, num_ghost, transverse_waves=2, prefactor=None,
          batch_transverse=False):
    """3D unsplit classic step (step3.f90 + flux3.f90 equivalent).

    Normal sweeps + limited corrections in x/y/z, transverse corner
    transport (every directional fluctuation A±dq is rpt3-split into
    up/down-going parts along each of the two transverse axes, modifying
    the orthogonal correction fluxes), and the reference's
    double-transverse (rptt3) corner-of-corner corrections — the full
    Langseth–LeVeque unsplit CTU scheme, stable to CFL 1 (pinned exactly
    by the product-form advection oracle, tests/test_ctu_exact.py).

    q: (num_eqn, nx, ny, nz) ghost-padded.  Returns (q_interior, cfl).
    """
    deltas = (dx, dy, dz)
    waves, dtdx_cells, capa, cfl = _step3_sweeps(
        q, aux, dt, deltas, rp, params, mthlim, order, fwave, index_capa,
        num_ghost)
    q_new = _step3_update(q, aux, waves, dtdx_cells, capa, dt, deltas,
                          rpt, rptt, params, num_ghost, transverse_waves,
                          prefactor, batch_transverse)
    return q_new, cfl


def _step3_update(q, aux, waves, dtdx_cells, capa, dt, deltas, rpt, rptt,
                  params, num_ghost, transverse_waves=2, prefactor=None,
                  batch_transverse=False):
    """Transverse corner transport + assembly of the 3D step (the
    rpt3/rptt3 + gadd/hadd half of reference flux3.f90), consuming the
    per-direction fluctuations from :func:`_step3_sweeps`.  All
    stencils here reach at most one cell, so a tiled driver can feed it
    PRE-SLICED waves (the phased form, :func:`step3_phased`) and get
    bitwise the fused result."""
    g = num_ghost
    shape = q.shape[1:]

    # correction-flux arrays per axis (at that axis' interfaces)
    F = {}
    for d in range(3):
        amdq, apdq, cqxx = waves[d]
        F[d] = cqxx if cqxx is not None else jnp.zeros_like(amdq)

    if rpt is not None and transverse_waves > 0:
        for d in range(3):                      # sweep axis
            axis_d = 1 + d
            q_l = _slc(q, axis_d, slice(0, shape[d] - 1))
            q_r = _slc(q, axis_d, slice(1, shape[d]))
            if aux is not None:
                a_l = _slc(aux, axis_d, slice(0, shape[d] - 1))
                a_r = _slc(aux, axis_d, slice(1, shape[d]))
            else:
                a_l = a_r = None
            # shared per-direction eigensystem (RiemannSolver.prefactor):
            # all 4 rpt + 8 rptt calls below otherwise re-derive the same
            # Roe averages at these interfaces
            kwd = {} if prefactor is None else {
                "eig": prefactor(d, q_l, q_r, a_l, a_r, params)}
            amdq, apdq, cqdd = waves[d]
            # transverse_waves >= 2 with order 2: the second-order
            # correction waves ride the transverse solves too (the 2D
            # flux2.f90 method(3)==2 trick; flux3.f90's full "22" mode)
            if transverse_waves >= 2 and cqdd is not None:
                amdq, apdq = amdq + cqdd, apdq - cqdd
            for e in range(3):                  # transverse axis
                if e == d:
                    continue
                half = 0.5 * (dt / deltas[d])
                axis_e = 1 + e
                f = 3 - d - e          # the third axis
                axis_f = 1 + f
                n_f = shape[f]
                coeff2 = (dt * dt) / (6.0 * deltas[d] * deltas[e])
                if batch_transverse:
                    # both imp splits in ONE rpt call and all four
                    # b-parts in ONE rptt call: the splits are linear in
                    # asdq (transverse_batchable contract), so stacking
                    # on a post-equation batch axis yields bitwise the
                    # per-call values while cutting the number of
                    # distinct VPU op chains 2-4x
                    asdq_b = jnp.stack([amdq, apdq], axis=1)
                    bm_b, bp_b = rpt(d, 0, q_l, q_r, a_l, a_r, asdq_b,
                                     params, trans_axis=e, **kwd)
                    if rptt is not None and transverse_waves >= 2:
                        b_all = jnp.stack(
                            [bm_b[:, 0], bp_b[:, 0], bm_b[:, 1],
                             bp_b[:, 1]], axis=1)
                        cm_b, cp_b = rptt(d, 2 + (f > e), 0, 0, q_l, q_r,
                                          a_l, a_r, b_all, params,
                                          trans_axis=f, **kwd)
                own = {}     # i0 -> summed own-row rptt blocks
                cross = {}   # (i0, e_start) -> summed crossing blocks
                fe_blocks = {}   # i0 -> rpt contribution block for F[e]
                for imp in (1, 2):
                    if batch_transverse:
                        bm, bp = bm_b[:, imp - 1], bp_b[:, imp - 1]
                    else:
                        asdq = amdq if imp == 1 else apdq
                        bm, bp = rpt(d, imp, q_l, q_r, a_l, a_r, asdq,
                                     params, trans_axis=e, **kwd)
                    i0 = imp - 1   # target cell offset along sweep axis
                    n_d = shape[d]
                    n_e = shape[e]
                    # below-going: F[e][.., cell i0+k (axis d), iface j-1
                    # (axis e)] -= half*bm   for cells j in [1, n_e-1]
                    bm_s = _slc(bm, axis_e, slice(1, n_e))
                    bp_s = _slc(bp, axis_e, slice(0, n_e - 1))
                    if capa is None:
                        c_bm = c_bp = half
                        co2_full = None
                    else:   # κ of the receiving cell (flux3.f90 dtdx1d(i1))
                        dd = _slc(dtdx_cells[d], d, slice(i0, i0 + n_d - 1))
                        c_bm = 0.5 * _slc(dd, e, slice(1, n_e))[None]
                        c_bp = 0.5 * _slc(dd, e, slice(0, n_e - 1))[None]
                        co2_full = (dt / (6.0 * deltas[e])) * dd
                    fe_blocks[i0] = -(c_bm * bm_s + c_bp * bp_s)

                    # ---- double-transverse (rptt3): corner-of-corner
                    # corrections into the third axis' fluxes.  Each
                    # C-split contributes +coeff2 at its own e-row and
                    # -coeff2 at the e-row it crosses into, so the
                    # f-flux carries the (1 - S^-_e) difference that the
                    # exact corner-transport expansion requires (verified
                    # against the product-form advection oracle).
                    # Contributions sharing the same embed offsets are
                    # summed in BLOCK space and padded into F[f] once
                    # per offset signature: the profiler showed the
                    # per-contribution pad+add chains (lowered to
                    # dynamic-update-slice fusions) costing 40% of the
                    # 192^3 step; grouping cuts those full-array writes
                    # from 16 to 6 per (d, e) pair.  Summation order is
                    # fixed and identical on every path (roundoff-level
                    # regrouping vs r3; decomposition invariance and the
                    # 1e-13 CTU oracle still hold).
                    if rptt is not None and transverse_waves >= 2:
                        for k_b, (b_part, e_dir) in enumerate(
                                ((bm, -1), (bp, 1))):
                            if batch_transverse:
                                idx = 2 * (imp - 1) + k_b
                                cm, cp = cm_b[:, idx], cp_b[:, idx]
                            else:
                                cm, cp = rptt(d, 2 + (f > e), imp, e_dir,
                                              q_l, q_r, a_l, a_r, b_part,
                                              params, trans_axis=f, **kwd)
                            # the b-part carries sign(v_e) but the exact
                            # corner expansion needs |v_e|: flip for the
                            # down-going (e_dir=-1) part
                            sgn = float(e_dir)
                            for c_part, f_off in ((cm, -1), (cp, 0)):
                                # valid f-iface targets: own k + f_off in
                                # [0, n_f-2]  -> slice source rows so the
                                # scatter stays in-bounds (edge rows only
                                # influence ghost updates)
                                f_src = (slice(1, n_f) if f_off == -1
                                         else slice(0, n_f - 1))
                                cs = _slc(c_part, axis_f, f_src)
                                if co2_full is None:
                                    co_cs = coeff2
                                else:   # κ-scaled, sliced like cs
                                    co_cs = _slc(co2_full, f, f_src)[None]
                                # the scaled product is shared by the
                                # own-row term and (slice-shifted,
                                # negated — both exact) the crossing
                                # term: ONE multiply, the c_part chain
                                # has a single arithmetic consumer
                                t = sgn * co_cs * cs
                                # + at the part's own e-row
                                own[i0] = (t if i0 not in own
                                           else own[i0] + t)
                                # - at the e-row it crosses into
                                if e_dir > 0:
                                    e_src = slice(0, n_e - 1)
                                    e_start = 1
                                else:
                                    e_src = slice(1, n_e)
                                    e_start = 0
                                blk = -_slc(t, axis_e, e_src)
                                key = (i0, e_start)
                                cross[key] = (blk if key not in cross
                                              else cross[key] + blk)
                # sum the padded blocks FIRST, then ONE add per flux
                # array.  (Concat-assembly — _merge1, as used in 2D —
                # was measured SLOWER here: 75.1 vs 85.2 M at 192^3;
                # minor-axis concats of these 4D slabs cost more than
                # the pad writes they replace.)
                acc = None
                for i0 in sorted(own):
                    p = _embed(own[i0], F[f], {axis_d: i0})
                    acc = p if acc is None else acc + p
                for i0, e_start in sorted(cross):
                    acc = acc + _embed(cross[(i0, e_start)], F[f],
                                       {axis_d: i0, axis_e: e_start})
                if acc is not None:
                    F[f] = F[f] + acc
                if fe_blocks:
                    F[e] = F[e] + (_embed(fe_blocks[0], F[e], {axis_d: 0})
                                   + _embed(fe_blocks[1], F[e],
                                            {axis_d: 1}))

    # ---- assemble update over cells 1..n-2 on every axis --------------
    def inner_cells(a):
        out = a
        for d in range(3):
            out = _slc(out, 1 + d, slice(1, out.shape[1 + d] - 1))
        return out

    qc = inner_cells(q)
    dq_tot = jnp.zeros_like(qc)
    for d in range(3):
        amdq, apdq, _ = waves[d]
        axis = 1 + d
        n = shape[d]
        # fluctuation terms: apdq at left interface, amdq at right
        ap = _slc(apdq, axis, slice(0, n - 2))
        am = _slc(amdq, axis, slice(1, n - 1))
        Fd_hi = _slc(F[d], axis, slice(1, n - 1))
        Fd_lo = _slc(F[d], axis, slice(0, n - 2))
        term = ap + am + (Fd_hi - Fd_lo)
        # strip to inner cells on the other axes
        for d2 in range(3):
            if d2 != d:
                term = _slc(term, 1 + d2, slice(1, term.shape[1 + d2] - 1))
        dtd = inner_cells(dtdx_cells[d][None])[0]
        dq_tot = dq_tot + dtd * term
    q_new = qc - dq_tot

    # q_new covers cells 1..n-2 per axis; interior cells are g..n-1-g,
    # i.e. slice(g-1, (n-2)-(g-1)) in q_new coordinates.
    out = q_new
    for d in range(3):
        out = _slc(out, 1 + d, slice(g - 1, out.shape[1 + d] - (g - 1)))
    return out


def step3_roll(q, dt, dx, dy, dz, rp, rpt, rptt, params, mthlim, order,
               num_ghost, transverse_waves=2, prefactor=None,
               roll=jnp.roll, cfl_shape=None, aux=None, fwave=False,
               index_capa=-1):
    """Shape-uniform roll form of :func:`step3` for the Pallas/Mosaic
    backend (round 5; same rationale as classic soa.step2_soa_roll):
    every intermediate keeps the full slab shape, interface quantity k
    lives at index k along its axis, slices/pads/embeds become circular
    rolls, and the wrap garbage — at most 2 cells deep per side on each
    axis (stencil + limiter + transverse/double-transverse shifts) —
    stays strictly inside the ``g = 2`` ghost band that the returned
    interior window [g, n-g) never reads.  Accumulation order matches
    step3 exactly, so interior values are bit-identical
    (tests/test_tiled_kernels.py pins it).

    Covers aux-carrying wave-form systems (e.g. 3D heterogeneous
    acoustics), capacity functions (per-cell dtdx, the flux3.f90
    dtdx1d(i1) coefficients in the transverse terms — roll form of the
    :func:`_step3_update` capa path), and fwave; q (num_eqn, nx, ny,
    nz) ghost-padded -> (q interior, cfl).  ``cfl_shape``: real extents
    when the caller padded for DMA alignment (dead cells never enter
    the CFL reduction windows)."""
    g = num_ghost
    shape = q.shape[1:]
    real = cfl_shape if cfl_shape is not None else shape
    deltas = (dx, dy, dz)

    def up(a, d, k=1):
        return roll(a, -k, a.ndim - 3 + d)

    def down(a, d, k=1):
        return roll(a, k, a.ndim - 3 + d)

    capa = aux[index_capa] if (aux is not None and index_capa >= 0) \
        else None
    # per-cell dtdx when a capacity function is present; scalar otherwise
    dtdx_d = [dt / deltas[d] if capa is None
              else dt / (deltas[d] * capa) for d in range(3)]

    # ---- normal sweeps (roll form of _sweep_normal) -------------------
    waves = {}
    cfl = None
    for d in range(3):
        dtdx = dtdx_d[d]
        q_l, q_r = q, up(q, d)
        a_l = aux if aux is not None else None
        a_r = up(aux, d) if aux is not None else None
        wave, s, amdq, apdq = rp(d, q_l, q_r, a_l, a_r, params)
        cqxx = None
        if order == 2:
            dtdxave = dtdx if capa is None \
                else 0.5 * (dtdx + up(dtdx, d))
            # limiter on full-shape interface arrays (roll form of
            # tvd.limiter_phi: dot_r[k] = <W_k, W_{k+1}>)
            num_waves = wave.shape[1]
            wnorm2 = jnp.sum(wave * wave, axis=0)
            ddot = jnp.sum(wave * up(wave, d), axis=0)
            dotu = jnp.where(s > 0.0, down(ddot, d), ddot)
            safe = wnorm2 > 0.0
            theta = jnp.where(safe, dotu / jnp.where(safe, wnorm2, 1.0),
                              0.0)
            phis = []
            for p in range(num_waves):
                lid = mthlim[p] if p < len(mthlim) else mthlim[-1]
                if lid == 0:
                    phis.append(jnp.ones_like(theta[p]))
                else:
                    if int(lid) in tvd.CFL_LIMITER_IDS:
                        nu = jnp.abs(s[p]) * dtdxave
                        ph = tvd._phi_cfl(int(lid), theta[p], nu)
                    else:
                        ph = tvd._phi(int(lid), theta[p])
                    phis.append(jnp.where(safe[p], ph, 1.0))
            phi = jnp.stack(phis)
            cqxx = _correction_flux(wave, phi, s, dtdxave, fwave)
        waves[d] = (amdq, apdq, cqxx)

        # CFL over interfaces touching interior cells (real extents)
        sl = [slice(0, real[d2]) for d2 in range(3)]
        sl[d] = slice(g - 1, real[d] - g)
        for d2 in range(3):
            if d2 != d:
                sl[d2] = slice(g, real[d2] - g)
        s_int = s[(slice(None),) + tuple(sl)]
        if capa is None:
            c = dtdx * jnp.max(jnp.abs(s_int))
        else:
            # upwinded per-cell dt/(dx κ): interface i against cell i
            # (left) and cell i+1 (right); slice FIRST, then
            # expand_dims (Mosaic gather rule, see step2_roll)
            sl_t = tuple(sl)
            dt_l = dtdx[sl_t][None]
            dt_r = up(dtdx, d)[sl_t][None]
            c = jnp.max(jnp.maximum(s_int * dt_r, -s_int * dt_l))
        cfl = c if cfl is None else jnp.maximum(cfl, c)

    # ---- transverse corner transport (roll form of _step3_update) -----
    F = {}
    for d in range(3):
        amdq, apdq, cqxx = waves[d]
        F[d] = cqxx if cqxx is not None else jnp.zeros_like(amdq)

    if rpt is not None and transverse_waves > 0:
        for d in range(3):
            q_l, q_r = q, up(q, d)
            a_l = aux if aux is not None else None
            a_r = up(aux, d) if aux is not None else None
            kwd = {} if prefactor is None else {
                "eig": prefactor(d, q_l, q_r, a_l, a_r, params)}
            amdq, apdq, cqdd = waves[d]
            if transverse_waves >= 2 and cqdd is not None:
                amdq, apdq = amdq + cqdd, apdq - cqdd
            for e in range(3):
                if e == d:
                    continue
                half = 0.5 * (dt / deltas[d])
                f = 3 - d - e
                coeff2 = (dt * dt) / (6.0 * deltas[d] * deltas[e])
                own = {}
                cross = {}
                fe_blocks = {}
                for imp in (1, 2):
                    asdq = amdq if imp == 1 else apdq
                    bm, bp = rpt(d, imp, q_l, q_r, a_l, a_r, asdq,
                                 params, trans_axis=e, **kwd)
                    i0 = imp - 1
                    if capa is None:
                        c_bm = c_bp = half
                        co2r = None
                    else:
                        # κ of the receiving cell (flux3.f90 dtdx1d(i1)
                        # — roll form of the _step3_update capa slices:
                        # the later down(·, d, i0) embed puts
                        # dtdx_cells[j] at output row j)
                        dd = up(dtdx_d[d], d, i0) if i0 else dtdx_d[d]
                        c_bm = (0.5 * up(dd, e))[None]
                        c_bp = (0.5 * dd)[None]
                        co2r = (dt / (6.0 * deltas[e])) * dd
                    # below-going feeds e-interface j-1, above-going j
                    fe_blocks[i0] = -(c_bm * up(bm, e) + c_bp * bp)
                    if rptt is not None and transverse_waves >= 2:
                        for b_part, e_dir in ((bm, -1), (bp, 1)):
                            cm, cp = rptt(d, 2 + (f > e), imp, e_dir,
                                          q_l, q_r, a_l, a_r, b_part,
                                          params, trans_axis=f, **kwd)
                            sgn = float(e_dir)
                            for c_part, f_off in ((cm, -1), (cp, 0)):
                                cs = up(c_part, f) if f_off == -1 \
                                    else c_part
                                if co2r is None:
                                    co_cs = coeff2
                                else:
                                    co_cs = (up(co2r, f) if f_off == -1
                                             else co2r)[None]
                                t = sgn * co_cs * cs
                                own[i0] = (t if i0 not in own
                                           else own[i0] + t)
                                if e_dir > 0:
                                    blk = -down(t, e)
                                    key = (i0, 1)
                                else:
                                    blk = -up(t, e)
                                    key = (i0, 0)
                                cross[key] = (blk if key not in cross
                                              else cross[key] + blk)
                acc = None
                for i0 in sorted(own):
                    p2 = down(own[i0], d, i0) if i0 else own[i0]
                    acc = p2 if acc is None else acc + p2
                for i0, e_start in sorted(cross):
                    blk = cross[(i0, e_start)]
                    # NOTE: blk already carries its e-shift; the embed
                    # offset along d remains
                    p2 = down(blk, d, i0) if i0 else blk
                    acc = acc + p2
                if acc is not None:
                    F[f] = F[f] + acc
                if fe_blocks:
                    F[e] = F[e] + (fe_blocks[0]
                                   + down(fe_blocks[1], d))

    # ---- assemble update ---------------------------------------------
    dq_tot = jnp.zeros_like(q)
    for d in range(3):
        amdq, apdq, _ = waves[d]
        term = down(apdq, d) + amdq + (F[d] - down(F[d], d))
        dq_tot = dq_tot + dtdx_d[d] * term
    q_new = q - dq_tot
    out = q_new
    for d in range(3):
        out = _slc(out, 1 + d, slice(g, shape[d] - g))
    return out, cfl


def step2_tiled(q, aux, dt, dx, dy, rp, rpt, params, mthlim, order, fwave,
                index_capa, num_ghost, transverse_waves=2, tile_rows=128,
                prefactor=None):
    """Row-tiled driver around :func:`step2` — same VMEM-blocking trick
    as classic/soa.py step2_soa_tiled, for the generic AoS kernel (aux,
    capacity, fwave, custom-amdq solvers).  Blocks of ``tile_rows``
    interior rows + num_ghost apron sequenced by ``lax.map``: per-tile
    intermediates (wave tensors, flux planes) stay small enough for
    XLA's memory-space assignment to hold in VMEM.  Bit-identical to the
    monolithic step; falls back to it when the rows don't divide."""
    from jax import lax

    g = num_ghost
    num_eqn, nx, ny = q.shape
    rows = nx - 2 * g
    tile_rows = auto_tile(rows, tile_rows)
    if tile_rows is None:
        return step2(q, aux, dt, dx, dy, rp, rpt, params, mthlim, order,
                     fwave, index_capa, g, transverse_waves, prefactor)
    nt = rows // tile_rows

    def body(s):
        blk = lax.dynamic_slice(q, (0, s, 0),
                                (num_eqn, tile_rows + 2 * g, ny))
        ablk = None if aux is None else lax.dynamic_slice(
            aux, (0, s, 0), (aux.shape[0], tile_rows + 2 * g, ny))
        return step2(blk, ablk, dt, dx, dy, rp, rpt, params, mthlim,
                     order, fwave, index_capa, g, transverse_waves,
                     prefactor)

    outs, cfls = lax.map(body, jnp.arange(nt) * tile_rows)
    q_new = jnp.moveaxis(outs, 0, 1).reshape(num_eqn, rows, ny - 2 * g)
    return q_new, jnp.max(cfls)


def tiled_xy_map(fn, q, aux, num_ghost, cap):
    """Shared (x, y) two-axis VMEM-blocking driver for 3D kernels:
    run ``fn(blk, ablk) -> (out_interior, cfl)`` over tiles of both
    leading spatial axes (apron = num_ghost each side), sequenced by
    ``lax.map``, and stitch the interiors back.  Per-tile slabs are thin
    pencils (num_eqn, tx+2g, ty+2g, nz) small enough that the dozens of
    per-direction intermediates live in VMEM.  (x-only tiling left
    ~15 MB planes per tile whose intermediates spilled to HBM.)
    ``cap`` is an int (same cap both axes) or an (x_cap, y_cap) pair —
    asymmetric tiles trade apron-recompute fraction against per-tile
    VMEM footprint.  Bit-identical stitching; returns None when the x
    rows don't divide (caller falls back to the monolithic kernel)."""
    from jax import lax

    g = num_ghost
    num_eqn, nx, ny, nz = q.shape
    rows_x, rows_y = nx - 2 * g, ny - 2 * g
    cap_x, cap_y = cap if isinstance(cap, (tuple, list)) else (cap, cap)
    tx = auto_tile(rows_x, cap_x)
    if tx is None:
        return None
    ty = auto_tile(rows_y, cap_y)
    ntx = rows_x // tx
    nty = rows_y // ty if ty is not None else 1
    ty_e = ty if ty is not None else rows_y   # y-extent per tile

    starts = jnp.stack(
        [jnp.repeat(jnp.arange(ntx) * tx, nty),
         jnp.tile(jnp.arange(nty) * (ty or 0), ntx)], axis=1)

    def body(se):
        sx, sy = se[0], se[1]
        blk = lax.dynamic_slice(
            q, (0, sx, sy, 0), (num_eqn, tx + 2 * g, ty_e + 2 * g, nz))
        ablk = None if aux is None else lax.dynamic_slice(
            aux, (0, sx, sy, 0),
            (aux.shape[0], tx + 2 * g, ty_e + 2 * g, nz))
        return fn(blk, ablk)

    outs, cfls = lax.map(body, starts)
    # (ntx*nty, ne, tx, ty_e, nzi) -> (ne, rows_x, rows_y, nzi)
    nzi = nz - 2 * g
    out = outs.reshape(ntx, nty, num_eqn, tx, ty_e, nzi)
    out = jnp.transpose(out, (2, 0, 3, 1, 4, 5)).reshape(
        num_eqn, rows_x, rows_y, nzi)
    return out, jnp.max(cfls)


def step3_tiled(q, aux, dt, dx, dy, dz, rp, rpt, rptt, params, mthlim,
                order, fwave, index_capa, num_ghost, transverse_waves=2,
                tile_rows=12, prefactor=None, batch_transverse=False):
    """(x, y)-tiled driver around :func:`step3` via
    :func:`tiled_xy_map`; falls back to the monolithic step when the
    rows don't divide."""
    def body(blk, ablk):
        return step3(blk, ablk, dt, dx, dy, dz, rp, rpt, rptt, params,
                     mthlim, order, fwave, index_capa, num_ghost,
                     transverse_waves, prefactor, batch_transverse)

    out = tiled_xy_map(body, q, aux, num_ghost, tile_rows)
    if out is None:
        return step3(q, aux, dt, dx, dy, dz, rp, rpt, rptt, params,
                     mthlim, order, fwave, index_capa, num_ghost,
                     transverse_waves, prefactor, batch_transverse)
    return out


def step3_phased(q, aux, dt, dx, dy, dz, rp, rpt, rptt, params, mthlim,
                 order, fwave, index_capa, num_ghost, transverse_waves=2,
                 tile_rows=12, prefactor=None, batch_transverse=False):
    """Phased 3D step: the normal sweeps (_step3_sweeps) run ONCE over
    the full grid — their fluctuation/correction arrays materialize to
    HBM — and only the transverse+assembly half (_step3_update) runs
    under the (x, y) tile loop, reading PRE-SLICED slabs of those
    arrays.  Eliminates the normal-sweep share of the tile apron
    recompute (the fused tile recomputes every sweep in a 2-ghost apron,
    a 1.78x factor at the (12,12) tile) at the price of ~12 full-grid
    array materializations.  Matches step3/step3_tiled to roundoff (the
    update's stencils reach at most one cell, so slabs of the full-grid
    arrays carry the same values the fused tile recomputes; XLA's
    per-graph fusion differences leave ~1-ulp residue, same as the
    tiled-vs-monolithic contract).  Falls back to the fused step when
    the rows don't divide."""
    from jax import lax

    g = num_ghost
    num_eqn, nx, ny, nz = q.shape
    rows_x, rows_y = nx - 2 * g, ny - 2 * g
    cap = tile_rows
    cap_x, cap_y = cap if isinstance(cap, (tuple, list)) else (cap, cap)
    tx = auto_tile(rows_x, cap_x)
    ty = auto_tile(rows_y, cap_y)
    if tx is None:
        return step3(q, aux, dt, dx, dy, dz, rp, rpt, rptt, params,
                     mthlim, order, fwave, index_capa, num_ghost,
                     transverse_waves, prefactor, batch_transverse)
    ntx = rows_x // tx
    nty = rows_y // ty if ty is not None else 1
    ty_e = ty if ty is not None else rows_y

    deltas = (dx, dy, dz)
    waves, dtdx_cells, capa, cfl = _step3_sweeps(
        q, aux, dt, deltas, rp, params, mthlim, order, fwave, index_capa, g)

    def slab4(a, sx, sy, iax=None):
        """Tile slab of a (ne, nx', ny', nz') array whose spatial axis
        ``iax`` (0/1/2 or None) is an interface axis (extent n-1)."""
        sizes = (a.shape[0],
                 tx + 2 * g - (1 if iax == 0 else 0),
                 ty_e + 2 * g - (1 if iax == 1 else 0),
                 a.shape[3])
        return lax.dynamic_slice(a, (0, sx, sy, 0), sizes)

    def slab3(a, sx, sy):
        sizes = (tx + 2 * g, ty_e + 2 * g, a.shape[2])
        return lax.dynamic_slice(a, (sx, sy, 0), sizes)

    starts = jnp.stack(
        [jnp.repeat(jnp.arange(ntx) * tx, nty),
         jnp.tile(jnp.arange(nty) * (ty or 0), ntx)], axis=1)

    def body(se):
        sx, sy = se[0], se[1]
        q_s = slab4(q, sx, sy)
        aux_s = None if aux is None else slab4(aux, sx, sy)
        waves_s = {}
        for d in range(3):
            amdq, apdq, cqxx = waves[d]
            waves_s[d] = (slab4(amdq, sx, sy, iax=d),
                          slab4(apdq, sx, sy, iax=d),
                          None if cqxx is None
                          else slab4(cqxx, sx, sy, iax=d))
        dtdx_s = [slab3(dc, sx, sy) for dc in dtdx_cells]
        capa_s = None if capa is None else slab3(capa, sx, sy)
        return _step3_update(q_s, aux_s, waves_s, dtdx_s, capa_s, dt,
                             deltas, rpt, rptt, params, g,
                             transverse_waves, prefactor, batch_transverse)

    outs = lax.map(body, starts)
    nzi = nz - 2 * g
    out = outs.reshape(ntx, nty, num_eqn, tx, ty_e, nzi)
    out = jnp.transpose(out, (2, 0, 3, 1, 4, 5)).reshape(
        num_eqn, rows_x, rows_y, nzi)
    return out, cfl


def auto_tile(rows, cap):
    """Pick the row-tile size for the VMEM-blocked drivers: the largest
    divisor d of ``rows`` with d <= cap, rows//d >= 2, and d >= cap//4
    (tiny tiles waste apron recompute).  None = don't tile.  An
    (x, y) pair (the 3D tilers accept one) falls back to its first
    entry so a tuple set on a 2D solver degrades gracefully."""
    if isinstance(cap, (tuple, list)):
        cap = cap[0] if cap else None
    if not cap or cap <= 0 or rows < 4:
        return None
    lo = max(1, cap // 4)
    for d in range(min(cap, rows // 2), lo - 1, -1):
        if rows % d == 0:
            return d
    return None
