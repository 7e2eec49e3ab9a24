"""Frame IO backends.

Rebuild of reference ``src/pyclaw/fileio/`` (SURVEY.md §2.5): format-name →
module dispatch, lazy import.  Available: ``ascii`` (clawpack classic
fort.t/fort.q format), ``hdf5``.  ``netcdf`` is gated out (no netCDF4 in the
environment); ``binary`` provides read support for Fortran-binary frames.
"""

VALID_FORMATS = ("ascii", "hdf5", "binary")
