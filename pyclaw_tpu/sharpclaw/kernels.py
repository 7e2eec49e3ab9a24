"""SharpClaw semidiscretization kernels — pure-XLA reference backend.

TPU-native equivalents of the reference Fortran (SURVEY.md §2.3):

  flux1      <- src/pyclaw/sharpclaw/flux1.f90   (:~1-200)
  flux2/3    <- src/pyclaw/sharpclaw/flux2.f90 / flux3.f90 (pencil loops)
  weno       <- src/pyclaw/sharpclaw/weno.f90    (via limiters.recon.weno5)
  reconstruct<- src/pyclaw/sharpclaw/reconstruct.f90 (recon dispatch)
  workspace  <- obsolete (no preallocated scratch under XLA)

Method of lines: reconstruct cell-edge values (WENO5 or TVD), solve Riemann
problems at interfaces, add the in-cell total fluctuation, assemble
dq = -dt/(kappa dx) * (apdq_{i-1/2} + amdq_{i+1/2} + adq_i).

The total fluctuation adq_i = f(qr_i) - f(ql_i) uses the registered
per-system flux function when the Riemann record carries one (reference
flux1.f90's tfluct-free default: two cheap flux evaluations); solvers
without a ``flux`` fall back to a second Riemann solve on (ql_i, qr_i)
summing amdq+apdq (identical to roundoff for any conservative solver —
pinned by tests/test_sharpclaw_flux.py).  A user ``tfluct`` solver
replaces either for well-balanced schemes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..limiters import recon


def _recon(qbc, lim_type, weno_order, tvd_limiter=4, backend="xla"):
    if lim_type == 2:
        if weno_order == 5:
            if backend == "pallas":
                from ..ops import weno5_pallas
                return weno5_pallas(qbc)
            return recon.weno5(qbc)
        return recon.weno(weno_order, qbc)
    elif lim_type == 1:
        return recon.tvd2(qbc, limiter_id=tvd_limiter)
    elif lim_type == 0:
        return qbc, qbc  # first-order: piecewise constant
    raise ValueError(f"bad lim_type {lim_type}")


def _recon_char_tvd(qbc, auxbc, params, evec, ixy, tvd_limiter):
    """Characteristic-wise TVD2 reconstruction (reference reconstruct.f90
    tvd2_char: lim_type=1, char_decomp=2): slope-limit the LOCAL
    characteristic components w = L q and transform the edge values
    back."""
    from ..limiters import tvd as tvdmod
    R, L = evec(ixy, qbc, auxbc, params)

    def proj(shift):
        return jnp.einsum("ab...,b...->a...", L, recon._shift(qbc, shift))

    w_m, w_0, w_p = proj(-1), proj(0), proj(1)
    dqm = w_0 - w_m
    dqp = w_p - w_0
    safe = dqp != 0.0
    theta = jnp.where(safe, dqm / jnp.where(safe, dqp, 1.0), 0.0)
    phi = jnp.where(safe, tvdmod._phi(tvd_limiter, theta), 0.0)
    slope = phi * dqp
    ql = jnp.einsum("ab...,b...->a...", R, w_0 - 0.5 * slope)
    qr = jnp.einsum("ab...,b...->a...", R, w_0 + 0.5 * slope)
    return ql, qr


def _interface_waves(qbc, auxbc, params, rp, ixy):
    """Riemann waves at every interface of the (last-axis) pencil:
    returns wave (num_eqn, num_waves, ..., n-1) for interface k between
    cells k, k+1."""
    q_l, q_r = qbc[..., :-1], qbc[..., 1:]
    if auxbc is not None:
        aux_l, aux_r = auxbc[..., :-1], auxbc[..., 1:]
    else:
        aux_l = aux_r = None
    wave, s, _, _ = rp(ixy, q_l, q_r, aux_l, aux_r, params)
    return wave


def _shift_ifc(a, m):
    """Shift an interface-indexed array by m with zero fill (zero waves
    beyond the ends degrade the stencil gracefully inside the ghost
    bands, which are trimmed)."""
    if m == 0:
        return a
    z = jnp.zeros_like(a[..., :abs(m)])
    if m > 0:
        return jnp.concatenate([a[..., m:], z], axis=-1)
    return jnp.concatenate([z, a[..., :m]], axis=-1)


def _recon_wave(qbc, auxbc, params, rp, ixy, lim_type, weno_order,
                tvd_limiter):
    """Wave-slope reconstruction (reference reconstruct.f90 tvd2_wave /
    weno.f90 weno5_wave; char_decomp=1): the reconstruction acts on the
    Riemann-solver wave decomposition of the interface jumps instead of
    on components.

    TVD form: cell slope = sum_p phi(theta_p) W^p at the cell's right
    interface, theta_p the left-neighbor wave projection ratio — the
    exact wave analog of recon.tvd2.

    WENO form: for each wave family and target interface I, the
    neighboring interfaces' waves are projected onto W_I giving relative
    strengths T_m = <W_{I+m}, W_I>/|W_I|^2; their cumulative sums form a
    pseudo-field with unit jump at I whose generic-order WENO edge value
    (limiters.recon.weno_stencil) is the fraction of W_I added to the
    cell average — 5th order where the wave field is smooth, monotone at
    discontinuities."""
    wave = _interface_waves(qbc, auxbc, params, rp, ixy)
    num_waves = wave.shape[1]
    n = qbc.shape[-1]

    wnorm2 = jnp.sum(wave * wave, axis=0)          # (nw, ..., n-1)
    safe = wnorm2 > 0.0
    inv = jnp.where(safe, 1.0 / jnp.where(safe, wnorm2, 1.0), 0.0)

    if lim_type == 1:
        from ..limiters import tvd as tvdmod
        d = jnp.sum(_shift_ifc(wave, -1) * wave, axis=0)   # <W_{k-1},W_k>
        theta = d * inv
        phi = jnp.where(safe, tvdmod._phi(tvd_limiter, theta), 0.0)
        slope_ifc = jnp.sum(phi[None] * wave, axis=1)      # (ne, ..., n-1)
        # cell i's slope lives at its RIGHT interface (index i)
        zero = jnp.zeros_like(slope_ifc[..., :1])
        slope = jnp.concatenate([slope_ifc, zero], axis=-1)
        ql = qbc - 0.5 * slope
        qr = qbc + 0.5 * slope
        return ql, qr

    # WENO wave form
    k = (weno_order + 1) // 2
    # T_m[k] = <W_{k+m}, W_k> / |W_k|^2 for m in [-k+1, k-1]
    T = {m: (jnp.sum(_shift_ifc(wave, m) * wave, axis=0) * inv
             if m != 0 else jnp.where(safe, 1.0, 0.0))
         for m in range(-k + 1, k)}

    # pseudo cell values around target interface I: v_0 = 0 (the cell
    # left of I), v_{j+1} - v_j = T_{j} -> v_j = sum of T over the
    # interfaces between pseudo-cell 0 and j
    def pseudo(j):
        if j == 0:
            return jnp.zeros_like(T[0])
        if j > 0:
            return sum(T[m] for m in range(0, j))
        return -sum(T[m] for m in range(j, 0))

    # RIGHT edge of cell i: target interface index i; pseudo cells
    # j = -k+1 .. k-1 relative to cell i (cell i is pseudo-cell 0)
    shifts_r = [pseudo(j) for j in range(-k + 1, k)]
    _, ps_r = recon.weno_stencil(weno_order, shifts_r)
    # LEFT edge of cell i: target interface i-1; cell i is pseudo-cell 1
    # relative to that interface -> j = -k+2 .. k, shifted base
    shifts_l = [pseudo(j) - 1.0 for j in range(-k + 2, k + 1)]
    ps_l, _ = recon.weno_stencil(weno_order, shifts_l)
    # ps values are fractions of the target wave; ps_l is relative to
    # v_1 = 0 after the -1 shift (cell i sits right of interface i-1)

    contrib_r = jnp.sum(ps_r[None] * wave, axis=1)      # at interface i
    contrib_l = jnp.sum(ps_l[None] * wave, axis=1)      # at interface i-1
    zero = jnp.zeros_like(contrib_r[..., :1])
    qr = qbc + jnp.concatenate([contrib_r, zero], axis=-1)
    ql = qbc + jnp.concatenate([zero, contrib_l], axis=-1)
    return ql, qr


def _recon_char(qbc, auxbc, params, evec, ixy, weno_order):
    """Characteristic-wise WENO reconstruction (reference weno5_char /
    reconstruct.f90 char_decomp=2 path, any supported order): project each
    cell's stencil onto that cell's eigenvectors, reconstruct the
    characteristic fields, and transform the edge values back."""
    R, L = evec(ixy, qbc, auxbc, params)
    k = (weno_order + 1) // 2
    ws = [jnp.einsum("ab...,b...->a...", L, recon._shift(qbc, m))
          for m in range(-k + 1, k)]
    wl, wr = recon.weno_stencil(weno_order, ws)
    ql = jnp.einsum("ab...,b...->a...", R, wl)
    qr = jnp.einsum("ab...,b...->a...", R, wr)
    return ql, qr


def _recon_char_ifc(qbc, auxbc, params, evec, ixy, weno_order):
    """Interface-eigensystem characteristic WENO (char_decomp=4).

    The classical finite-volume WENO-char variant: for every interface,
    evaluate the eigensystem at the arithmetic mean of the two adjacent
    cells and reconstruct BOTH biased edge states in that one basis (so
    the left and right states entering each Riemann problem are limited
    in the same characteristic frame, unlike char_decomp=2 which uses
    each cell's own basis).  The reference enumerates char_decomp=4
    (SURVEY.md §2.3) but its exact form was unverifiable against the
    empty mount; this is the standard interface-basis formulation, and
    it reduces exactly to char_decomp=2 for constant-coefficient systems
    (pinned by tests/test_char_decomp.py)."""
    q_avg = 0.5 * (qbc[..., :-1] + qbc[..., 1:])
    aux_avg = (None if auxbc is None
               else 0.5 * (auxbc[..., :-1] + auxbc[..., 1:]))
    R, L = evec(ixy, q_avg, aux_avg, params)       # (ne, ne, ..., n-1)
    k = (weno_order + 1) // 2

    def cells(m):
        # interface-indexed view of cell i+m for interface i (cells i,i+1)
        return recon._shift(qbc, m)[..., :-1]

    def proj(m):
        return jnp.einsum("ab...,b...->a...", L, cells(m))

    # left state at interface i = right edge of cell i
    ws_r = [proj(m) for m in range(-k + 1, k)]
    _, wr = recon.weno_stencil(weno_order, ws_r)
    # right state at interface i = left edge of cell i+1
    ws_l = [proj(m + 1) for m in range(-k + 1, k)]
    wl, _ = recon.weno_stencil(weno_order, ws_l)

    edge_l = jnp.einsum("ab...,b...->a...", R, wr)  # cell i's right edge
    edge_r = jnp.einsum("ab...,b...->a...", R, wl)  # cell i+1's left edge
    # back to the per-cell (ql, qr) contract; the unknowable outermost
    # edges sit inside the trimmed ghost band
    qr = jnp.concatenate([edge_l, qbc[..., -1:]], axis=-1)
    ql = jnp.concatenate([qbc[..., :1], edge_r], axis=-1)
    return ql, qr


def _recon_char_trans(qbc, auxbc, params, evec, ixy, weno_order):
    """Transmission-based characteristic WENO reconstruction (reference
    weno.f90 weno5_trans / reconstruct.f90 char_decomp=3 path, any
    supported order).

    In heterogeneous media the absolute characteristic variables w = L q
    are not comparable across material interfaces (L varies per cell), so
    projecting the stencil's cell VALUES onto one basis (char_decomp=2)
    mixes incompatible quantities.  Only the interface JUMPS decompose
    meaningfully: each jump Delta q is projected onto the TARGET cell's
    local basis — the component of the neighbour's jump that transmits
    into cell i's wave families — and the cumulative sums of those
    transmitted strengths form per-family pseudo-fields (zero at cell i)
    whose WENO edge values are added back through R_i.

    For constant-coefficient systems L is uniform and this reduces
    exactly to char_decomp=2 (the pseudo-field is w shifted by the
    constant w_i, and WENO edge reconstruction commutes with constant
    shifts) — tests/test_char_decomp.py uses that as the oracle."""
    R, L = evec(ixy, qbc, auxbc, params)
    k = (weno_order + 1) // 2
    # interface-indexed jumps, padded so dq_pad[..., i] = q_{i+1} - q_i
    dq = qbc[..., 1:] - qbc[..., :-1]
    dq_pad = jnp.concatenate([dq, jnp.zeros_like(dq[..., :1])], axis=-1)
    # alpha_m[..., i] = L_i . (Delta q at interface i+m): the strength of
    # the jump m interfaces away as transmitted into cell i's families
    alpha = {m: jnp.einsum("ab...,b...->a...", L, _shift_ifc(dq_pad, m))
             for m in range(-k + 1, k - 1)}

    def pseudo(j):
        # v_j - v_{j-1} = alpha_{j-1}; v_0 = 0 (cell i itself)
        if j == 0:
            return jnp.zeros_like(qbc)
        if j > 0:
            return sum(alpha[m] for m in range(0, j))
        return -sum(alpha[m] for m in range(j, 0))

    ws = [pseudo(j) for j in range(-k + 1, k)]
    wl, wr = recon.weno_stencil(weno_order, ws)
    ql = qbc + jnp.einsum("ab...,b...->a...", R, wl)
    qr = qbc + jnp.einsum("ab...,b...->a...", R, wr)
    return ql, qr


def dq_1d(qbc, auxbc, dt, dx, rp, params, lim_type, weno_order, index_capa,
          num_ghost, ixy=0, tfluct=None, char_decomp=0, evec=None,
          positivity=None, backend="xla", tvd_limiter=4, flux=None):
    """Semidiscrete update along the LAST axis (flux1.f90 equivalent).

    qbc: (num_eqn, ..., n) ghost-padded.  Returns (dq interior along last
    axis, cfl).  dq includes the dt factor (SharpClaw convention).
    """
    g = num_ghost
    n = qbc.shape[-1]

    if char_decomp == 1:
        ql, qr = _recon_wave(qbc, auxbc, params, rp, ixy, lim_type,
                             weno_order, tvd_limiter=tvd_limiter)
    elif char_decomp == 2 and evec is not None and lim_type == 2:
        ql, qr = _recon_char(qbc, auxbc, params, evec, ixy, weno_order)
    elif char_decomp == 2 and evec is not None and lim_type == 1:
        ql, qr = _recon_char_tvd(qbc, auxbc, params, evec, ixy,
                                 tvd_limiter=tvd_limiter)
    elif char_decomp == 3 and evec is not None and lim_type == 2:
        ql, qr = _recon_char_trans(qbc, auxbc, params, evec, ixy,
                                   weno_order)
    elif char_decomp == 3 and evec is not None and lim_type == 1:
        # the TVD characteristic path already slope-limits LOCAL-basis
        # jumps L_i(q_i - q_{i +/- 1}) — it is transmission-based by
        # construction, so modes 2 and 3 coincide for lim_type=1
        ql, qr = _recon_char_tvd(qbc, auxbc, params, evec, ixy,
                                 tvd_limiter=tvd_limiter)
    elif char_decomp == 4 and evec is not None and lim_type == 2:
        ql, qr = _recon_char_ifc(qbc, auxbc, params, evec, ixy, weno_order)
    elif char_decomp == 4 and evec is not None and lim_type == 1:
        # interface-basis TVD == local-basis TVD for the slope-limited
        # 3-cell stencil family; reuse the characteristic TVD path
        ql, qr = _recon_char_tvd(qbc, auxbc, params, evec, ixy,
                                 tvd_limiter=tvd_limiter)
    else:
        ql, qr = _recon(qbc, lim_type, weno_order,
                        tvd_limiter=tvd_limiter, backend=backend)

    if positivity is not None:
        # per-cell first-order fallback where a reconstructed edge state
        # would be unphysical (keeps strong-shock problems alive; the
        # reference relies on char_decomp + tfluct for this)
        ok = positivity(ql, auxbc, params) & positivity(qr, auxbc, params)
        ql = jnp.where(ok[None], ql, qbc)
        qr = jnp.where(ok[None], qr, qbc)

    # interface k between cells k, k+1: states (qr_k, ql_{k+1})
    q_li = qr[..., :-1]
    q_ri = ql[..., 1:]
    if auxbc is not None:
        aux_l, aux_r = auxbc[..., :-1], auxbc[..., 1:]
    else:
        aux_l = aux_r = None

    wave, s, amdq, apdq = rp(ixy, q_li, q_ri, aux_l, aux_r, params)

    # in-cell total fluctuation
    if tfluct is not None:
        adq = tfluct(ixy, ql, qr, auxbc, auxbc, params)
    elif flux is not None:
        adq = flux(ixy, qr, auxbc, params) - flux(ixy, ql, auxbc, params)
    else:
        _, _, amdq2, apdq2 = rp(ixy, ql, qr, auxbc, auxbc, params)
        adq = amdq2 + apdq2

    capa = auxbc[index_capa] if index_capa >= 0 else None
    if capa is None:
        dtdx = jnp.full((n,), dt / dx, dtype=qbc.dtype)
    else:
        dtdx = dt / (dx * capa)

    s_int = s[..., g - 1:n - g]
    cfl = jnp.max(jnp.maximum(s_int * dtdx[..., g:n - g + 1],
                              -s_int * dtdx[..., g - 1:n - g]))

    # cells 1..n-2: apdq at left interface (k=i-1), amdq at right (k=i)
    dq_cells = -(dtdx[..., 1:-1]) * (apdq[..., :-1] + amdq[..., 1:]
                                     + adq[..., 1:-1])
    return dq_cells[..., g - 1:n - 1 - g], cfl


def dq_nd(qbc, auxbc, dt, deltas, rp, params, lim_type, weno_order,
          index_capa, num_ghost, tfluct=None, char_decomp=0, evec=None,
          positivity=None, backend="xla", tvd_limiter=4, flux=None):
    """Multi-dimensional MOL update: per-axis 1D sweeps accumulated
    (flux2.f90/flux3.f90 equivalent — no transverse solves needed).

    Returns (dq over the interior cells, cfl)."""
    g = num_ghost
    num_dim = qbc.ndim - 1
    dq_total = None
    cfl = None
    for d in range(num_dim):
        axis = 1 + d
        qm = jnp.moveaxis(qbc, axis, -1)
        auxm = None if auxbc is None else jnp.moveaxis(auxbc, axis, -1)
        dqd, cfld = dq_1d(qm, auxm, dt, deltas[d], rp, params, lim_type,
                          weno_order, index_capa, g, ixy=d, tfluct=tfluct,
                          char_decomp=char_decomp, evec=evec,
                          positivity=positivity, backend=backend,
                          tvd_limiter=tvd_limiter, flux=flux)
        dqd = jnp.moveaxis(dqd, -1, axis)
        # strip ghosts on the other axes
        sl = [slice(None)] * dqd.ndim
        for d2 in range(num_dim):
            if d2 != d:
                sl[1 + d2] = slice(g, dqd.shape[1 + d2] - g)
        dqd = dqd[tuple(sl)]
        dq_total = dqd if dq_total is None else dq_total + dqd
        cfl = cfld if cfl is None else jnp.maximum(cfl, cfld)
    return dq_total, cfl


def dq_nd_tiled(qbc, auxbc, dt, deltas, rp, params, lim_type, weno_order,
                index_capa, num_ghost, tfluct=None, char_decomp=0,
                evec=None, positivity=None, backend="xla", tvd_limiter=4,
                tile_rows=128, flux=None):
    """Row-tiled driver around :func:`dq_nd` (same VMEM-blocking trick as
    classic/kernels.step2_tiled): any kernel that maps a ghost-padded
    block to its interior with stencil radius <= num_ghost tiles this
    way.  Blocks of ``tile_rows`` interior rows along the first spatial
    axis + num_ghost apron, sequenced by ``lax.map``.  Bit-identical;
    falls back to the monolithic form when the rows don't divide."""
    from jax import lax

    g = num_ghost
    num_eqn = qbc.shape[0]
    nx = qbc.shape[1]
    num_dim = qbc.ndim - 1
    rows = nx - 2 * g
    from ..classic.kernels import auto_tile
    tile_rows = auto_tile(rows, tile_rows)
    if tile_rows is None:
        return dq_nd(qbc, auxbc, dt, deltas, rp, params, lim_type,
                     weno_order, index_capa, g, tfluct=tfluct,
                     char_decomp=char_decomp, evec=evec,
                     positivity=positivity, backend=backend,
                     tvd_limiter=tvd_limiter, flux=flux)
    nt = rows // tile_rows
    rest = qbc.shape[2:]

    def run_dq(blk, ablk):
        return dq_nd(blk, ablk, dt, deltas, rp, params, lim_type,
                     weno_order, index_capa, g, tfluct=tfluct,
                     char_decomp=char_decomp, evec=evec,
                     positivity=positivity, backend=backend,
                     tvd_limiter=tvd_limiter, flux=flux)

    if num_dim == 3:
        # tile BOTH leading axes in 3D via the shared driver: per-tile
        # pencils keep the many per-direction WENO/Riemann intermediates
        # VMEM-sized (same lesson as classic step3_tiled)
        from ..classic.kernels import tiled_xy_map
        out = tiled_xy_map(run_dq, qbc, auxbc, g, tile_rows)
        if out is not None:
            return out

    def body(s):
        start = (0, s) + (0,) * len(rest)
        blk = lax.dynamic_slice(qbc, start,
                                (num_eqn, tile_rows + 2 * g) + rest)
        ablk = None if auxbc is None else lax.dynamic_slice(
            auxbc, start, (auxbc.shape[0], tile_rows + 2 * g) + rest)
        return run_dq(blk, ablk)

    outs, cfls = lax.map(body, jnp.arange(nt) * tile_rows)
    out_rest = tuple(n - 2 * g for n in rest)
    dq = jnp.moveaxis(outs, 0, 1).reshape((num_eqn, rows) + out_rest)
    return dq, jnp.max(cfls)
