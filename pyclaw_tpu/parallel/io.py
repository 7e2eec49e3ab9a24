"""Distributed frame IO — the PETSc-Viewer-equivalent seam.

Rebuild of reference ``src/petclaw/fileio/petsc.py`` (:~1-250; SURVEY.md
§2.6 seam #3 and §5.8 "collective IO"): frames of a distributed run are
written WITHOUT gathering the global array — each addressable shard goes
to its own hdf5 file tagged with its global index block, plus one JSON
index carrying t/geometry/metadata.  ``read_sharded`` reassembles the
global array (host) or feeds a restart.

On multi-host deployments each process writes only its addressable
shards (process-local files), which is exactly the per-host shard IO the
north star prescribes; a single host writes all of them.
"""

from __future__ import annotations

import json
import os

import numpy as np


def write_sharded(q_dev, state, frame, path, file_prefix="shard"):
    """Write a sharded jax.Array's addressable shards + index file."""
    import h5py
    os.makedirs(path, exist_ok=True)
    patch = state.patch
    index = {
        "t": float(state.t),
        "num_eqn": state.num_eqn,
        "num_aux": state.num_aux,
        "num_cells": patch.num_cells_global,
        "lower": patch.lower_global,
        "delta": patch.delta,
        "shards": [],
    }
    for k, shard in enumerate(q_dev.addressable_shards):
        fname = f"{file_prefix}{frame:04d}_p{k:03d}.h5"
        starts = [sl.start or 0 for sl in shard.index]
        stops = [sl.stop if sl.stop is not None else dim
                 for sl, dim in zip(shard.index, q_dev.shape)]
        with h5py.File(os.path.join(path, fname), "w") as f:
            f.create_dataset("q", data=np.asarray(shard.data))
            f.attrs["start"] = starts
            f.attrs["stop"] = stops
        index["shards"].append({"file": fname, "start": starts,
                                "stop": stops})
    with open(os.path.join(path, f"{file_prefix}{frame:04d}.json"),
              "w") as f:
        json.dump(index, f)
    return index


def read_sharded(frame, path, file_prefix="shard"):
    """Reassemble a sharded frame -> (q_global ndarray, meta dict)."""
    import h5py
    with open(os.path.join(path, f"{file_prefix}{frame:04d}.json")) as f:
        index = json.load(f)
    shape = (index["num_eqn"],) + tuple(index["num_cells"])
    q = np.empty(shape)
    filled = np.zeros(shape, dtype=bool)
    for sh in index["shards"]:
        with h5py.File(os.path.join(path, sh["file"]), "r") as f:
            data = np.array(f["q"])
        sl = tuple(slice(a, b) for a, b in zip(sh["start"], sh["stop"]))
        q[sl] = data
        filled[sl] = True
    if not filled.all():
        raise ValueError("sharded frame is incomplete "
                         "(missing shards for part of the domain)")
    return q, index
