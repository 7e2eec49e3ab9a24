"""Distributed frame IO — thin functional wrappers over the real backend.

The collective-IO seam (reference ``src/petclaw/fileio/petsc.py``;
SURVEY.md §2.6 seam #3, §5.8) lives in ``pyclaw_tpu.fileio.sharded`` and
is wired into Controller/Solution as ``output_format='sharded'`` /
``file_format='sharded'``.  These wrappers keep the direct array-level
API for tools and tests.
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

from ..fileio import sharded


def write_sharded(q_dev, state, frame, path, file_prefix="shard"):
    """Write a sharded jax.Array's addressable shards + index file."""
    sol = SimpleNamespace(states=[state],
                          domain=SimpleNamespace(patches=[state.patch]))
    old = getattr(state, "q_dev", None)
    state.q_dev = q_dev
    try:
        sharded.write(sol, frame, path, file_prefix=file_prefix)
    finally:
        state.q_dev = old
    with open(os.path.join(path, f"{file_prefix}{frame:04d}.json")) as f:
        return json.load(f)


def read_sharded(frame, path, file_prefix="shard"):
    """Reassemble a sharded frame -> (q_global ndarray, meta dict)."""
    from ..solution import Solution
    sol = Solution()
    sharded.read(sol, frame, path, file_prefix=file_prefix)
    with open(os.path.join(path, f"{file_prefix}{frame:04d}.json")) as f:
        meta = json.load(f)
    return sol.q, meta
