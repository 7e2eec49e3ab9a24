"""bc.extend_aligned (ghost extension fused with the Pallas DMA
alignment tail) must reproduce bc.extend exactly in the ghost-extended
window for the uniform BC kinds it fuses, hold finite data in the tail,
and decline (None) every combination it cannot fuse."""

import numpy as np
import jax.numpy as jnp

from pyclaw_tpu import bc


def _q(ne=3, nx=7, ny=9):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((ne, nx, ny)))


def test_uniform_extrap_matches_extend():
    q = _q()
    lower = upper = [bc.BC.extrap, bc.BC.extrap]
    ref = bc.extend(q, 2, lower, upper)
    got = bc.extend_aligned(q, 2, lower, upper, tail=(4, 12))
    assert got.shape == (3, 7 + 4 + 4, 9 + 4 + 12)
    np.testing.assert_array_equal(np.asarray(got[:, :11, :13]),
                                  np.asarray(ref))
    assert np.all(np.isfinite(np.asarray(got)))


def test_uniform_periodic_matches_extend():
    q = _q(ne=2, nx=8, ny=10)
    lower = upper = [bc.BC.periodic, bc.BC.periodic]
    ref = bc.extend(q, 3, lower, upper)
    got = bc.extend_aligned(q, 3, lower, upper, tail=(2, 6))
    np.testing.assert_array_equal(np.asarray(got[:, :14, :16]),
                                  np.asarray(ref))
    assert np.all(np.isfinite(np.asarray(got)))


def test_unfusable_combinations_decline():
    q = _q()
    assert bc.extend_aligned(q, 2, [bc.BC.extrap, bc.BC.periodic],
                             [bc.BC.extrap, bc.BC.periodic]) is None
    assert bc.extend_aligned(q, 2, [bc.BC.wall] * 2,
                             [bc.BC.wall] * 2) is None
    assert bc.extend_aligned(q, 2, [bc.BC.custom, bc.BC.extrap],
                             [bc.BC.extrap] * 2) is None
