"""Materialization-traffic regression guard (VERDICT r2 item 6).

The round-2 perf ladder (131M -> 958M cups) was won by eliminating HBM
materialization: the row-tiled VMEM-blocked drivers keep per-tile
intermediates on chip, so the compiled step's entry-computation buffer
bytes approach the q-in/q-out minimum.  This guard compiles the classic
2D Euler step on CPU (no TPU needed) and asserts the proxy stays within
a factor of that minimum — if someone reintroduces full-grid wave
tensors or disables tiling, the ratio jumps (monolithic measures ~7x vs
~2x tiled at 512^2; thresholds have slack for XLA version churn) and
this test fails.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "examples")
sys.path.insert(0, "tools")

from hlo_traffic import entry_output_bytes  # noqa: E402


def _entry_ratio(tile_rows, mx=512):
    from euler_2d_quadrants import setup

    claw = setup(mx=mx, my=mx, solver_type="classic", outdir=None,
                 dtype="float32")
    claw.solver.soa_tile_rows = tile_rows
    claw.solver.setup(claw.solution)
    q = jnp.asarray(claw.solution.state.q)
    txt = jax.jit(claw.solver._step_fn).lower(
        q, None, 0.2 / mx, 0.0).compile().as_text()
    min_bytes = 3 * q.size * q.dtype.itemsize     # q in twice + q out
    return entry_output_bytes(txt) / min_bytes


def test_tiled_step_traffic_near_minimum():
    ratio = _entry_ratio(128)
    assert ratio < 3.5, (
        f"classic 2D step materializes {ratio:.1f}x the q-in/q-out "
        "minimum — a VMEM-blocking regression (expected ~2x)")


def test_guard_detects_disabled_tiling():
    """The guard must actually fire when tiling is off: the monolithic
    step's materialization is a multiple of the tiled one's."""
    assert _entry_ratio(0) > 1.5 * _entry_ratio(128)
