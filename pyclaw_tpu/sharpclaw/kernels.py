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

The total fluctuation adq_i = f(qr_i) - f(ql_i) is computed by calling the
Riemann solver on (ql_i, qr_i) within each cell and summing amdq+apdq
(exactly the reference's tfluct-free path in flux1.f90), so no per-system
flux function is needed; a user ``tfluct`` solver can replace it for
well-balanced schemes.
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


def dq_1d(qbc, auxbc, dt, dx, rp, params, lim_type, weno_order, index_capa,
          num_ghost, ixy=0, tfluct=None, char_decomp=0, evec=None,
          positivity=None, backend="xla"):
    """Semidiscrete update along the LAST axis (flux1.f90 equivalent).

    qbc: (num_eqn, ..., n) ghost-padded.  Returns (dq interior along last
    axis, cfl).  dq includes the dt factor (SharpClaw convention).
    """
    g = num_ghost
    n = qbc.shape[-1]

    if char_decomp and evec is not None and lim_type == 2:
        ql, qr = _recon_char(qbc, auxbc, params, evec, ixy, weno_order)
    else:
        ql, qr = _recon(qbc, lim_type, weno_order, backend=backend)

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
          positivity=None, backend="xla"):
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
                          positivity=positivity, backend=backend)
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
