"""Frame IO backends.

Rebuild of reference ``src/pyclaw/fileio/`` (SURVEY.md §2.5): format-name →
module dispatch, lazy import.  Available: ``ascii`` (clawpack classic
fort.t/fort.q format), ``hdf5``, ``netcdf`` (NetCDF-3 64-bit-offset via
scipy — the reference's netCDF4 library is absent here), and ``binary``
(read support for Fortran-binary frames).
"""

VALID_FORMATS = ("ascii", "hdf5", "netcdf", "binary", "sharded")
