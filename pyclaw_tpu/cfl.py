"""CFL accumulator.

Rebuild of reference ``src/pyclaw/cfl.py — class CFL`` (:~1-45) and its
parallel override ``src/petclaw/cfl.py`` (:~1-50).  The reference keeps this
as a class solely so PetClaw can swap in an MPI max-allreduce; here the
*distributed* reduction happens inside the jitted step itself
(``jax.lax.pmax`` over the device mesh — see pyclaw_tpu.parallel.reduce), so
the host-side object is always a plain cache.  The seam is preserved so the
solver code never changes between serial and distributed runs.
"""


class CFL:
    def __init__(self):
        self._local_max = 0.0
        self._global_max = 0.0

    def get_cached_max(self):
        return self._global_max

    def set_local_max(self, v):
        self._local_max = float(v)

    def update_global_max(self, v=None):
        # Serial: global max == local max.  Distributed: v already reduced
        # on-device via pmax before it reaches the host.
        if v is not None:
            self._local_max = float(v)
        self._global_max = self._local_max
        return self._global_max
