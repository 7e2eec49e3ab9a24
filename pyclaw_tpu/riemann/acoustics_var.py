"""Variable-coefficient (heterogeneous-media) acoustics Riemann solvers.

Physics parity with reference ``riemann/src/rp1_acoustics_var.f90`` and
``rpn2_vc_acoustics.f90`` (examples acoustics_1d_heterogeneous /
acoustics_2d_variable; SURVEY.md §2.8): per-cell material parameters in
aux — aux[0] = impedance Z, aux[1] = sound speed c.  At an interface the
jump splits against the one-sided impedances:

    a1 = (-dp + Z_r du) / (Z_l + Z_r)     left-going,  speed -c_l
    a2 = ( dp + Z_l du) / (Z_l + Z_r)     right-going, speed +c_r
    W1 = a1 (-Z_l, n),  W2 = a2 (Z_r, n)
"""

from __future__ import annotations

import jax.numpy as jnp


def _rp_acoustics_var(ixy, q_l, q_r, aux_l, aux_r, params):
    num_eqn = q_l.shape[0]
    mu = 1 + ixy
    z_l, c_l = aux_l[0], aux_l[1]
    z_r, c_r = aux_r[0], aux_r[1]
    d = q_r - q_l
    denom = z_l + z_r
    a1 = (-d[0] + z_r * d[mu]) / denom
    a2 = (d[0] + z_l * d[mu]) / denom

    wave = jnp.zeros((num_eqn, 2) + d.shape[1:], dtype=q_l.dtype)
    wave = wave.at[0, 0].set(-a1 * z_l)
    wave = wave.at[mu, 0].set(a1)
    wave = wave.at[0, 1].set(a2 * z_r)
    wave = wave.at[mu, 1].set(a2)

    s = jnp.stack([-c_l, c_r])
    amdq = -c_l * wave[:, 0]
    apdq = c_r * wave[:, 1]
    return wave, s, amdq, apdq


from . import RiemannSolver  # noqa: E402

acoustics_variable_1D = RiemannSolver("acoustics_variable_1D", 1, 2, 2,
                                      _rp_acoustics_var)
# 2D heterogeneous acoustics: normal solver only — the vc transverse solve
# needs aux rows of the adjacent pencils (use dimensional splitting or
# transverse_waves=0)
vc_acoustics_2D = RiemannSolver("vc_acoustics_2D", 2, 3, 2,
                                _rp_acoustics_var)
