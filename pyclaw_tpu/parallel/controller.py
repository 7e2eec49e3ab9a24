"""Process-aware Controller — the petclaw/controller.py equivalent.

Reference behavior rebuilt (SURVEY.md §2.6): every rank runs the same
orchestration loop, but file-creating side effects and log chatter happen
on rank 0 only, EXCEPT collective formats where each rank writes its own
shards.  Here:

  - ``output_format='sharded'`` (the default, like petclaw's 'petsc'):
    every process writes its addressable shards via
    ``pyclaw_tpu.fileio.sharded`` — no global gather ever happens.
  - gather-based formats ('ascii', 'hdf5', ...): single-host runs work
    unchanged; multi-host runs refuse (the global array is not
    addressable on one host) with a pointer to 'sharded'.
  - gauges / log output: process 0 only.

Restart from a sharded frame:  ``Solution(k, path=..., file_format='sharded')``.
"""

from __future__ import annotations

from .. import controller as _serial
from .distributed import is_main_process


class Controller(_serial.Controller):
    def __init__(self):
        super().__init__()
        self.output_format = "sharded"

    def _write(self, frame):
        if self.output_format is None:
            return
        fmts = (list(self.output_format)
                if isinstance(self.output_format, (list, tuple))
                else [self.output_format])
        keep = self.output_format
        try:
            for fmt in fmts:
                if fmt != "sharded":
                    if not is_main_process():
                        continue  # rank-0 writes the gather formats
                    if not getattr(self.solution.state.q,
                                   "is_fully_addressable", True):
                        raise ValueError(
                            f"output_format={fmt!r} needs the global array "
                            "on one host; use 'sharded' for multi-host runs")
                self.output_format = fmt
                super()._write(frame)
        finally:
            self.output_format = keep

    def _write_gauges(self):
        if not is_main_process():
            return
        super()._write_gauges()

    def _configure_logging(self):
        super()._configure_logging()
        if not is_main_process():
            import logging
            for name in ("pyclaw.controller", "pyclaw.solver", "pyclaw.io"):
                logging.getLogger(name).setLevel(logging.ERROR)
