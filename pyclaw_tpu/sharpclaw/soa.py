"""SoA fast path for the SharpClaw 2D semidiscretization.

Performance rebuild of ``flux2.f90``'s pencil loops (SURVEY.md §2.3) in
the dataflow XLA fuses best on TPU, mirroring classic/soa.py: the
generic ``kernels.dq_nd`` moveaxis-transposes the full AoS array per
direction and materializes ``(num_eqn, num_waves, nx, ny)`` wave tensors
TWICE per direction per RK stage (interface + in-cell Riemann calls) —
with SSP104's 10 stages that dominates the BASELINE cfg4 wall clock.
Here each equation is an independent 2D plane: WENO edge reconstruction
runs per-component with axis-aware slicing (no transposes, no rolls) and
the Riemann algebra stays in per-wave 2D chains via the rpn_soa protocol
(classic/soa.py).

Same numerics as kernels.dq_nd — pinned by tests/test_soa.py.
"""

from __future__ import annotations

from functools import reduce

import jax.numpy as jnp

from ..limiters import recon


def _slc(a, axis, sl):
    idx = [slice(None)] * a.ndim
    idx[axis] = sl
    return a[tuple(idx)]


def _shift_ax(a, k, axis):
    """out[i] = a[i+k] along `axis`, edge-replicated (the invalid band is
    inside the ghost region, trimmed by the caller)."""
    if k == 0:
        return a
    n = a.shape[axis]
    if k > 0:
        core = _slc(a, axis, slice(k, n))
        edge = _slc(a, axis, slice(n - 1, n))
        reps = [core] + [edge] * k
    else:
        core = _slc(a, axis, slice(0, n + k))
        edge = _slc(a, axis, slice(0, 1))
        reps = [edge] * (-k) + [core]
    return jnp.concatenate(reps, axis=axis)


def _weno_edges(v, axis, weno_order):
    shifts = [_shift_ax(v, m, axis)
              for m in range(-(weno_order + 1) // 2 + 1,
                             (weno_order + 1) // 2)]
    return recon.weno_stencil(weno_order, shifts)


def _combine(waves, speeds, num_eqn, zero):
    """Godunov fluctuations from SoA waves: (amdq, apdq) per equation."""
    amdq, apdq = [], []
    for e in range(num_eqn):
        am = ap = None
        for w, sp in zip(waves, speeds):
            if w[e] is None:
                continue
            am_t = jnp.minimum(sp, 0.0) * w[e]
            ap_t = jnp.maximum(sp, 0.0) * w[e]
            am = am_t if am is None else am + am_t
            ap = ap_t if ap is None else ap + ap_t
        amdq.append(am if am is not None else zero)
        apdq.append(ap if ap is not None else zero)
    return amdq, apdq


def _dq_dir_soa(qs, axis, dt, dxi, rpn_soa, params, weno_order, num_ghost,
                positivity, flux_soa=None):
    """One directional semidiscrete sweep on per-equation 2D planes.
    Returns (dq per-eqn list over cells 1..n-2 along `axis`, full extent
    on the other axis, cfl)."""
    g = num_ghost
    num_eqn = len(qs)
    aaxis = axis          # planes have no leading equation axis
    n = qs[0].shape[aaxis]

    ql, qr = [], []
    for e in range(num_eqn):
        l, r = _weno_edges(qs[e], aaxis, weno_order)
        ql.append(l)
        qr.append(r)

    if positivity is not None:
        ok = positivity(ql, None, params) & positivity(qr, None, params)
        ql = [jnp.where(ok, l, c) for l, c in zip(ql, qs)]
        qr = [jnp.where(ok, r, c) for r, c in zip(qr, qs)]

    # interface k between cells k, k+1: states (qr_k, ql_{k+1})
    q_li = tuple(_slc(r, aaxis, slice(0, n - 1)) for r in qr)
    q_ri = tuple(_slc(l, aaxis, slice(1, n)) for l in ql)
    waves, speeds = rpn_soa(axis, q_li, q_ri, params)
    zero_i = jnp.zeros_like(q_li[0])
    amdq, apdq = _combine(waves, speeds, num_eqn, zero_i)

    # in-cell total fluctuation adq = f(qr) - f(ql) via the per-system
    # flux when registered (two cheap flux evals — reference flux1.f90
    # default); otherwise a second Riemann solve sum_p s_p W_p
    zero_c = jnp.zeros_like(qs[0])
    if flux_soa is not None:
        fl = flux_soa(axis, tuple(ql), params)
        fr = flux_soa(axis, tuple(qr), params)
        adq = [(fr[e] if fr[e] is not None else zero_c)
               - (fl[e] if fl[e] is not None else zero_c)
               for e in range(num_eqn)]
    else:
        waves2, speeds2 = rpn_soa(axis, tuple(ql), tuple(qr), params)
        adq = []
        for e in range(num_eqn):
            a = None
            for w, sp in zip(waves2, speeds2):
                if w[e] is None:
                    continue
                t = sp * w[e]
                a = t if a is None else a + t
            adq.append(a if a is not None else zero_c)

    dtdx = dt / dxi
    cfl = dtdx * reduce(jnp.maximum,
                        (jnp.max(jnp.abs(_slc(s, aaxis,
                                              slice(g - 1, n - g))))
                         if jnp.ndim(s) else jnp.abs(s)
                         for s in speeds))

    dq = []
    for e in range(num_eqn):
        dq.append(-dtdx * (_slc(apdq[e], aaxis, slice(0, n - 2))
                           + _slc(amdq[e], aaxis, slice(1, n - 1))
                           + _slc(adq[e], aaxis, slice(1, n - 1))))
    return dq, cfl


def dq_2d_soa(qbc, dt, dx, dy, rpn_soa, params, weno_order, num_ghost,
              positivity=None, flux_soa=None):
    """2D MOL semidiscrete update, SoA dataflow.  Same contract as
    kernels.dq_nd restricted to {aux=None, no capacity, lim_type=2,
    char_decomp=0, no tfluct}: qbc (num_eqn, nx, ny) ghost-padded ->
    (dq over interior cells incl. the dt factor, cfl)."""
    g = num_ghost
    num_eqn, nx, ny = qbc.shape
    qs = tuple(qbc[e] for e in range(num_eqn))

    dqx, cflx = _dq_dir_soa(qs, 0, dt, dx, rpn_soa, params, weno_order,
                            g, positivity, flux_soa=flux_soa)
    dqy, cfly = _dq_dir_soa(qs, 1, dt, dy, rpn_soa, params, weno_order,
                            g, positivity, flux_soa=flux_soa)

    out = []
    for e in range(num_eqn):
        # dq_dir covers cells 1..n-2 along its axis, full on the other;
        # trim both to the interior (cells g..n-g-1)
        x_part = dqx[e][g - 1:nx - 1 - g, g:ny - g]
        y_part = dqy[e][g:nx - g, g - 1:ny - 1 - g]
        out.append(x_part + y_part)
    return jnp.stack(out), jnp.maximum(cflx, cfly)


def _dq_dir_roll(qs, axis, dt, dxi, rpn_soa, params, weno_order,
                 num_ghost, positivity, flux_soa, roll, real_shape):
    """Shape-uniform roll form of :func:`_dq_dir_soa` for the
    Pallas/Mosaic backend (same rationale as classic
    soa.step2_soa_roll): every array keeps the full slab shape, edge
    replication becomes circular wrap garbage, and the garbage radius —
    (k-1) stencil shifts + 1 interface shift + 1 update shift for WENO
    order 2k-1 — is strictly inside the ``g = k`` ghost band, so the
    interior window and the CFL slices (bounded by ``real_shape``, the
    un-padded extents — dead DMA-alignment cells hold inf speeds) never
    read it.  Returns the FULL slab-shaped dq (cell i valid for i in
    [g, n_real-g) along ``axis``) and cfl."""
    g = num_ghost
    num_eqn = len(qs)
    n_real = real_shape[axis]
    # sweep axis clipped to the interior-interface window (as in
    # _dq_dir_soa); the other axis clipped to its real extent only
    sl = [slice(0, real_shape[0]), slice(0, real_shape[1])]
    sl[axis] = slice(g - 1, n_real - g)
    sl = tuple(sl)

    def sh(a, k):       # out[i] = a[i+k], circular
        return roll(a, -k, axis)

    k = (weno_order + 1) // 2
    ql, qr = [], []
    for e in range(num_eqn):
        shifts = [sh(qs[e], m) for m in range(-k + 1, k)]
        l, r = recon.weno_stencil(weno_order, shifts)
        ql.append(l)
        qr.append(r)

    if positivity is not None:
        ok = positivity(ql, None, params) & positivity(qr, None, params)
        ql = [jnp.where(ok, l, c) for l, c in zip(ql, qs)]
        qr = [jnp.where(ok, r, c) for r, c in zip(qr, qs)]

    # interface i between cells i, i+1: states (qr_i, ql_{i+1})
    q_li = tuple(qr)
    q_ri = tuple(sh(l, 1) for l in ql)
    waves, speeds = rpn_soa(axis, q_li, q_ri, params)
    zero = jnp.zeros_like(qs[0])
    amdq, apdq = _combine(waves, speeds, num_eqn, zero)

    if flux_soa is not None:
        fl = flux_soa(axis, tuple(ql), params)
        fr = flux_soa(axis, tuple(qr), params)
        adq = [(fr[e] if fr[e] is not None else zero)
               - (fl[e] if fl[e] is not None else zero)
               for e in range(num_eqn)]
    else:
        waves2, speeds2 = rpn_soa(axis, tuple(ql), tuple(qr), params)
        adq = []
        for e in range(num_eqn):
            a = None
            for w, sp in zip(waves2, speeds2):
                if w[e] is None:
                    continue
                t = sp * w[e]
                a = t if a is None else a + t
            adq.append(a if a is not None else zero)

    dtdx = dt / dxi
    cfl = dtdx * reduce(jnp.maximum,
                        (jnp.max(jnp.abs(s[sl]))
                         if jnp.ndim(s) else jnp.abs(s)
                         for s in speeds))

    # dq at cell i: -(dt/dx) (apdq_{i-1} + amdq_i + adq_i)
    dq = [-dtdx * (roll(apdq[e], 1, axis) + amdq[e] + adq[e])
          for e in range(num_eqn)]
    return dq, cfl


def dq_2d_soa_roll(qbc, dt, dx, dy, rpn_soa, params, weno_order,
                   num_ghost, positivity=None, flux_soa=None,
                   roll=jnp.roll, cfl_shape=None):
    """Roll-form :func:`dq_2d_soa` (Pallas backend body).  Interior
    values are bit-identical to dq_2d_soa (tests/test_soa.py); see
    classic soa.step2_soa_roll for the garbage-containment argument.
    ``cfl_shape``: real (rows, cols) when the caller padded for DMA
    alignment."""
    g = num_ghost
    num_eqn, nx, ny = qbc.shape
    nxr, nyr = cfl_shape if cfl_shape is not None else (nx, ny)
    qs = tuple(qbc[e] for e in range(num_eqn))

    dqx, cflx = _dq_dir_roll(qs, 0, dt, dx, rpn_soa, params, weno_order,
                             g, positivity, flux_soa, roll, (nxr, nyr))
    dqy, cfly = _dq_dir_roll(qs, 1, dt, dy, rpn_soa, params, weno_order,
                             g, positivity, flux_soa, roll, (nxr, nyr))

    out = [dqx[e][g:nx - g, g:ny - g] + dqy[e][g:nx - g, g:ny - g]
           for e in range(num_eqn)]
    return jnp.stack(out), jnp.maximum(cflx, cfly)


def dq_2d_soa_tiled(qbc, dt, dx, dy, rpn_soa, params, weno_order,
                    num_ghost, positivity=None, tile_rows=128,
                    flux_soa=None):
    """Row-tiled driver around :func:`dq_2d_soa` (same trick as
    classic/soa.py step2_soa_tiled): blocks of ``tile_rows`` interior
    rows + num_ghost apron, sequenced by ``lax.map`` so every per-tile
    intermediate (WENO stencils, wave chains) fits in VMEM instead of
    round-tripping HBM.  Bit-identical to the monolithic form; falls
    back to it when the rows don't divide."""
    from jax import lax

    g = num_ghost
    num_eqn, nx, ny = qbc.shape
    rows = nx - 2 * g
    from ..classic.kernels import auto_tile
    tile_rows = auto_tile(rows, tile_rows)
    if tile_rows is None:
        return dq_2d_soa(qbc, dt, dx, dy, rpn_soa, params, weno_order,
                         g, positivity, flux_soa=flux_soa)
    nt = rows // tile_rows

    def body(s):
        blk = lax.dynamic_slice(qbc, (0, s, 0),
                                (num_eqn, tile_rows + 2 * g, ny))
        return dq_2d_soa(blk, dt, dx, dy, rpn_soa, params, weno_order,
                         g, positivity, flux_soa=flux_soa)

    outs, cfls = lax.map(body, jnp.arange(nt) * tile_rows)
    dq = jnp.moveaxis(outs, 0, 1).reshape(num_eqn, rows, ny - 2 * g)
    return dq, jnp.max(cfls)
