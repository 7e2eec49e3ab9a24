"""Sharded frame format — collective IO without a global gather.

Rebuild of reference ``src/petclaw/fileio/petsc.py`` (:~1-250; SURVEY.md
§2.6 seam #3, §5.8 "collective IO"): frames of a distributed run are
written WITHOUT assembling the global array on any host.  Each process
writes one hdf5 file per addressable shard of the device array, tagged
with the shard's global index block; process 0 writes a JSON index
carrying t / geometry / the full shard table (computable on every
process from the array's sharding, so no communication is needed).

Format on disk (frame 7, default prefix):
    shard0007.json            index: t, num_eqn, num_cells, lower, delta,
                              problem_data, shard table
    shard0007_p000.h5 ...     one dataset "q" (+"aux") per global shard

``read`` reassembles the global array on the host (restart path,
SURVEY.md §3.4) — every process reads the full table, so a restart needs
the shard files visible on a shared filesystem (the reference's PETSc
Viewer assumption as well).
"""

from __future__ import annotations

import json
import os

import numpy as np


def _index_name(prefix, frame):
    return f"{prefix}{frame:04d}.json"


def _shard_name(prefix, frame, k):
    return f"{prefix}{frame:04d}_p{k:03d}.h5"


def _block(slices, shape):
    starts = tuple(sl.start or 0 for sl in slices)
    stops = tuple(sl.stop if sl.stop is not None else dim
                  for sl, dim in zip(slices, shape))
    return starts, stops


def _shard_table(arr):
    """Global shard table [(device, start, stop), ...] in a deterministic
    (device-id) order, identical on every process.  Replicated blocks
    (mesh axes the array is not sharded over) are deduplicated — the
    lowest-id device owns the block."""
    shape = arr.shape
    table = []
    if hasattr(arr, "sharding"):
        idx_map = arr.sharding.devices_indices_map(shape)
        seen = set()
        for dev in sorted(idx_map, key=lambda d: d.id):
            starts, stops = _block(idx_map[dev], shape)
            if (starts, stops) in seen:
                continue
            seen.add((starts, stops))
            table.append((dev, list(starts), list(stops)))
    else:  # plain host array: one shard covering everything
        table.append((None, [0] * arr.ndim, list(shape)))
    return table


def write(solution, frame, path, file_prefix="shard", write_aux=False,
          options=None, write_p=False):
    import h5py
    import jax

    state = solution.states[0]
    patch = solution.domain.patches[0]
    if write_p:
        raise NotImplementedError("write_p with the sharded format: compute "
                                  "p on the restart side instead")

    q = state.q_dev if getattr(state, "q_dev", None) is not None else state.q
    aux = state.aux if write_aux else None
    table = _shard_table(q)
    proc = jax.process_index()

    pos_to_k = {(tuple(starts), tuple(stops)): k
                for k, (_, starts, stops) in enumerate(table)}

    def _write_one(k, starts, stops, data):
        sl = tuple(slice(a, b) for a, b in zip(starts, stops))
        with h5py.File(os.path.join(path,
                                    _shard_name(file_prefix, frame, k)),
                       "w") as f:
            f.create_dataset("q", data=data)
            if aux is not None:
                f.create_dataset("aux", data=np.asarray(aux)[sl])
            f.attrs["start"] = starts
            f.attrs["stop"] = stops

    if hasattr(q, "addressable_shards"):
        written = set()
        for shard in q.addressable_shards:
            starts, stops = _block(shard.index, q.shape)
            k = pos_to_k[(starts, stops)]
            owner = table[k][0]
            if k in written or (owner is not None
                                and owner.process_index != proc):
                continue  # replica, or another host owns this block
            written.add(k)
            _write_one(k, list(starts), list(stops), np.asarray(shard.data))
    elif proc == 0:   # host array (e.g. the t=0 frame before any step):
        _write_one(0, table[0][1], table[0][2], np.asarray(q))

    if proc == 0:
        index = {
            "t": float(state.t),
            "num_eqn": state.num_eqn,
            "num_aux": state.num_aux,
            "num_cells": list(patch.num_cells_global),
            "lower": list(patch.lower_global),
            "delta": list(patch.delta),
            "problem_data": {k: v for k, v in state.problem_data.items()
                             if isinstance(v, (int, float, bool, str))},
            "shards": [{"file": _shard_name(file_prefix, frame, k),
                        "start": starts, "stop": stops}
                       for k, (dev, starts, stops) in enumerate(table)],
        }
        with open(os.path.join(path, _index_name(file_prefix, frame)),
                  "w") as f:
            json.dump(index, f)


def read(solution, frame, path, file_prefix="shard", read_aux=False,
         options=None):
    import h5py

    from ..geometry import Dimension, Domain
    from ..state import State

    with open(os.path.join(path, _index_name(file_prefix, frame))) as f:
        index = json.load(f)

    num_cells = index["num_cells"]
    lower = index["lower"]
    delta = index["delta"]
    dims = [Dimension(lo, lo + n * d, n, name=nm)
            for lo, n, d, nm in zip(lower, num_cells, delta,
                                    ("x", "y", "z"))]
    domain = Domain(dims)
    state = State(domain, index["num_eqn"], index["num_aux"])
    state.t = index["t"]
    state.problem_data.update(index.get("problem_data", {}))

    shape = (index["num_eqn"],) + tuple(num_cells)
    q = np.empty(shape)
    filled = np.zeros(tuple(num_cells), dtype=bool)
    aux = None
    for sh in index["shards"]:
        with h5py.File(os.path.join(path, sh["file"]), "r") as f:
            data = np.array(f["q"])
            if read_aux and "aux" in f:
                if aux is None:
                    aux = np.empty((index["num_aux"],) + tuple(num_cells))
                asl = tuple(slice(a, b) for a, b in
                            zip(sh["start"], sh["stop"]))
                aux[asl] = np.array(f["aux"])
        sl = tuple(slice(a, b) for a, b in zip(sh["start"], sh["stop"]))
        q[sl] = data
        filled[sl[1:]] = True
    if not filled.all():
        raise ValueError("sharded frame is incomplete (missing shards for "
                         "part of the domain)")
    state.q = q
    if aux is not None:
        state.aux = aux

    solution.states = [state]
    solution.domain = domain
    return solution
