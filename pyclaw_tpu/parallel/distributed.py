"""Multi-host bootstrap — the MPI_Init / PETSc-comm-world equivalent.

Reference analog: petclaw gets its world communicator implicitly from
``mpi4py``/PETSc at import (SURVEY.md §2.6, §3.3).  On TPU pods the
equivalent is ``jax.distributed.initialize``: one Python process per host,
each seeing its local chips; after initialization ``jax.devices()`` is the
GLOBAL device list and a Mesh built over it spans the pod, with halo
``ppermute`` traffic riding ICI between hosts.

Launch recipe (N hosts; matches docs/performance.md):

    # identical program on every host, e.g. via GCE metadata / mpirun-like
    # launcher; TPU pod slices auto-discover coordinates:
    from pyclaw_tpu import parallel
    parallel.init_distributed()            # env/TPU-metadata autodetect
    # ... build solver/controller exactly as in the serial program ...

    # explicit form (CPU/GPU clusters or manual testing):
    parallel.init_distributed(coordinator_address="host0:8476",
                              num_processes=N, process_id=rank)

Every process runs the same Controller code; IO and logging are gated by
``is_main_process`` (rank-0 pattern, reference petclaw/controller.py) and
the ``sharded`` frame format writes only process-local shards.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("pyclaw.controller")

_initialized = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None, **kwargs):
    """Initialize the multi-host runtime (idempotent).

    No-arg form autodetects from the environment (TPU pod metadata /
    JAX_COORDINATOR_ADDRESS etc. — jax.distributed's own discovery).
    Returns ``(process_index, process_count)``.
    """
    global _initialized
    import os

    import jax

    # generic-cluster env recipe (mpirun/srun-style launchers): the
    # coordinator/size/rank triple via environment variables — TPU pod
    # slices autodetect instead and need none of these
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and (num_processes is not None
                                        or process_id is not None):
        # partial env recipe: jax.distributed.initialize would fall back
        # to TPU-pod autodetect and fail opaquely on generic clusters
        raise ValueError(
            "init_distributed: JAX_NUM_PROCESSES/JAX_PROCESS_ID are set "
            "but no coordinator address — set JAX_COORDINATOR_ADDRESS "
            "(host:port of process 0) as well; generic clusters need the "
            "full triple, TPU pod slices autodetect and need none")

    want = (coordinator_address is not None or num_processes is not None
            or bool(os.environ.get("JAX_COORDINATOR_ADDRESS")))
    if (want and not _initialized
            and not jax.distributed.is_initialized()):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids, **kwargs)
        except RuntimeError as e:
            if "must be called before" in str(e):
                raise RuntimeError(
                    "pyclaw_tpu.parallel.init_distributed() must be the "
                    "first JAX-touching call in the program — move it above "
                    "any jax.devices()/array creation (same rule as "
                    "jax.distributed.initialize)") from e
            raise
    _initialized = True
    info = (jax.process_index(), jax.process_count())
    logger.info("distributed init: process %d of %d, %d global devices",
                info[0], info[1], len(jax.devices()))
    return info


def process_index():
    import jax
    return jax.process_index()


def process_count():
    import jax
    return jax.process_count()


def is_main_process():
    return process_index() == 0
