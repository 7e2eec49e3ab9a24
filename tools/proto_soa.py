"""Prototype: SoA (struct-of-2D-arrays) x-sweep for Euler 4-wave vs the
current AoS wave-tensor sweep — measures whether keeping every wave as
fused 2D chains (never materializing the (4,4,nx,ny) tensor) buys HBM
traffic on the real TPU.  Throwaway measurement tool.

Usage: python tools/proto_soa.py [n=1024] [iters=100]
"""

import sys
import time

import jax
import jax.numpy as jnp

from pyclaw_tpu.classic import kernels
from pyclaw_tpu.limiters import tvd
from pyclaw_tpu.riemann import euler_4wave_2D

GAMMA = 1.4
MTHLIM = [4, 4, 4, 4]


def _mc(theta):
    return jnp.maximum(0.0, jnp.minimum((1.0 + theta) / 2.0,
                                        jnp.minimum(2.0, 2.0 * theta)))


def sweep_x_soa(q, dtdx):
    """Normal x-sweep, SoA: returns dq contribution on cells 1..nx-2."""
    g1 = GAMMA - 1.0
    ql, qr = q[:, :-1], q[:, 1:]
    rl, rr = ql[0], qr[0]
    srl, srr = jnp.sqrt(rl), jnp.sqrt(rr)
    denom = srl + srr
    u = (ql[1] / srl + qr[1] / srr) / denom
    v = (ql[2] / srl + qr[2] / srr) / denom
    pl = g1 * (ql[3] - 0.5 * (ql[1] ** 2 + ql[2] ** 2) / rl)
    pr = g1 * (qr[3] - 0.5 * (qr[1] ** 2 + qr[2] ** 2) / rr)
    H = ((ql[3] + pl) / srl + (qr[3] + pr) / srr) / denom
    a2 = g1 * (H - 0.5 * (u * u + v * v))
    a = jnp.sqrt(a2)

    d0 = qr[0] - ql[0]
    dmu = qr[1] - ql[1]
    dmv = qr[2] - ql[2]
    dE = qr[3] - ql[3]

    euv = H - (u * u + v * v)
    a3 = g1 / a2 * (euv * d0 + u * dmu + v * dmv - dE)
    a2w = dmv - v * d0
    a4 = (dmu + (a - u) * d0 - a * a3) / (2.0 * a)
    a1 = d0 - a3 - a4

    z = jnp.zeros_like(d0)
    waves = (
        (a1, a1 * (u - a), a1 * v, a1 * (H - u * a)),
        (a3, a3 * u, a3 * v, a3 * 0.5 * (u * u + v * v)),
        (z, z, a2w, a2w * v),
        (a4, a4 * (u + a), a4 * v, a4 * (H + u * a)),
    )
    speeds = (u - a, u, u, u + a)

    # limiter factors phi_p (2D each)
    phis = []
    for p in range(4):
        comps = waves[p]
        wn2 = sum(c * c for c in comps)
        dshift = sum(c[:-1] * c[1:] for c in comps)  # (nx-2, ny)
        zrow = jnp.zeros_like(dshift[:1])
        dot_r = jnp.concatenate([dshift, zrow], axis=0)
        dot_l = jnp.concatenate([zrow, dshift], axis=0)
        dotu = jnp.where(speeds[p] > 0.0, dot_l, dot_r)
        safe = wn2 > 0.0
        theta = jnp.where(safe, dotu / jnp.where(safe, wn2, 1.0), 0.0)
        phis.append(jnp.where(safe, _mc(theta), 1.0))

    amdq, apdq, cqxx = [], [], []
    for e in range(4):
        am = z
        ap = z
        cq = z
        for p in range(4):
            sp = speeds[p]
            w = waves[p][e]
            am = am + jnp.minimum(sp, 0.0) * w
            ap = ap + jnp.maximum(sp, 0.0) * w
            absp = jnp.abs(sp)
            cq = cq + 0.5 * absp * (1.0 - absp * dtdx) * phis[p] * w
        amdq.append(am)
        apdq.append(ap)
        cqxx.append(cq)

    # assemble dq on interior cells (1..nx-2)
    dq = []
    for e in range(4):
        dq.append((apdq[e][:-1] + amdq[e][1:]
                   + cqxx[e][1:] - cqxx[e][:-1]) * dtdx)
    cfl = dtdx * jnp.maximum(jnp.max(jnp.abs(speeds[0])),
                             jnp.max(jnp.abs(speeds[3])))
    return jnp.stack(dq), cfl


def sweep_x_aos(q, dtdx, params):
    wave, s, amdq, apdq, cqxx, _ = kernels._sweep_normal(
        q, None, 0, euler_4wave_2D.rp, params, MTHLIM, 2, False,
        jnp.asarray(dtdx, q.dtype))
    dq = (apdq[:, :-1] + amdq[:, 1:] + cqxx[:, 1:] - cqxx[:, :-1]) * dtdx
    cfl = dtdx * jnp.max(jnp.abs(s))
    return dq, cfl


def main(n=1024, iters=100):
    import numpy as np
    rng = np.random.default_rng(0)
    q0 = np.empty((4, n + 4, n + 4), np.float32)
    q0[0] = 1.0 + 0.1 * rng.random((n + 4, n + 4))
    q0[1] = 0.1 * rng.standard_normal((n + 4, n + 4))
    q0[2] = 0.1 * rng.standard_normal((n + 4, n + 4))
    q0[3] = 2.5 + 0.5 * rng.random((n + 4, n + 4))
    q = jnp.asarray(q0)
    dtdx = 0.2
    params = {"gamma": GAMMA}

    @jax.jit
    def run_soa(q0, k):
        def body(i, c):
            qc, cm = c
            dq, cfl = sweep_x_soa(qc, dtdx)
            qc = qc.at[:, 1:-1, :].add(-1e-6 * dq)
            return qc, jnp.maximum(cm, cfl)
        return jax.lax.fori_loop(0, k, body, (q0, jnp.float32(0)))

    @jax.jit
    def run_aos(q0, k):
        def body(i, c):
            qc, cm = c
            dq, cfl = sweep_x_aos(qc, dtdx, params)
            qc = qc.at[:, 1:-1, :].add(-1e-6 * dq)
            return qc, jnp.maximum(cm, cfl)
        return jax.lax.fori_loop(0, k, body, (q0, jnp.float32(0)))

    # equality check (single application)
    dq1, c1 = jax.jit(lambda q: sweep_x_soa(q, dtdx))(q)
    dq2, c2 = jax.jit(lambda q: sweep_x_aos(q, dtdx, params))(q)
    err = float(jnp.max(jnp.abs(dq1 - dq2)))
    print("max |dq_soa - dq_aos| =", err, " cfl diff:",
          float(jnp.abs(c1 - c2)))

    def timed(fn, k):
        best = 1e99
        for _ in range(3):
            t0 = time.perf_counter()
            out, cm = fn(q, k)
            float(jnp.sum(out[0, ::256, ::256])) + float(cm)
            best = min(best, time.perf_counter() - t0)
        return best

    for name, fn in (("soa", run_soa), ("aos", run_aos)):
        timed(fn, 10)
        t_small = timed(fn, 10)
        t_big = timed(fn, 10 + iters)
        dt_step = (t_big - t_small) / iters
        cups = n * n / dt_step
        print(f"{name}: {dt_step*1e3:.3f} ms/sweep  "
              f"({cups/1e9:.2f} G cell-sweeps/s)")


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
