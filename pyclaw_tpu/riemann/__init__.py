"""Riemann solver library.

TPU-native rebuild of the reference's sibling package ``clawpack.riemann``
(SURVEY.md §2.8).  Where the reference compiles one f2py module per Fortran
``rp*.f90`` and passes ``._cpointer`` function pointers into the sweep
kernels, here every solver is a **pure jnp function** operating on whole
interface arrays, registered in a :class:`RiemannSolver` record that also
carries the ``num_eqn`` / ``num_waves`` metadata (the reference keeps that
in a static table in ``riemann/__init__.py``).

Calling conventions (the core ABI — reference SURVEY.md §2.8):

  normal:      rp(ixy, q_l, q_r, aux_l, aux_r, params)
                 -> wave (num_eqn, num_waves, *n), s (num_waves, *n),
                    amdq (num_eqn, *n), apdq (num_eqn, *n)
  transverse:  rpt(ixy, imp, q_l, q_r, aux_l, aux_r, asdq, params)
                 -> bmasdq, bpasdq        (each (num_eqn, *n))
  double-transverse (3D): rptt(ixy, icoor, imp, impt, q_l, q_r, aux_l,
                 aux_r, bsasdq, params) -> cmbsasdq, cpbsasdq

``ixy`` is a *static* Python int (0=x, 1=y, 2=z sweep).  ``params`` is the
problem_data dict of physics scalars (closed over by jit — the analog of the
reference's Fortran ``cparam`` common block).  All arithmetic broadcasts
over arbitrary trailing spatial axes so the same function serves 1D pencils
and full 2D/3D arrays.
"""

from __future__ import annotations


class RiemannSolver:
    """Metadata record for one Riemann solver (reference: the per-module
    attributes attached in riemann/__init__.py + static table)."""

    def __init__(self, name, num_dim, num_eqn, num_waves, rp,
                 rpt=None, rptt=None, requires=()):
        self.name = name
        self.num_dim = num_dim
        self.num_eqn = num_eqn
        self.num_waves = num_waves
        self.rp = rp          # normal solver
        self.rpt = rpt        # transverse solver (2D/3D)
        self.rptt = rptt      # double-transverse solver (3D)
        # optional shared-eigensystem hook: prefactor(ixy, q_l, q_r,
        # aux_l, aux_r, params) -> opaque pytree computed ONCE per sweep
        # direction and passed as eig= to every rpt/rptt call at those
        # interfaces.  In 3D every one of the 12 rpt3 + 24 rptt3 calls
        # per step otherwise re-derives the identical Roe averages
        # (sqrt/divide-heavy); hoisting them is the dominant flop diet of
        # the transverse section.  Solvers defining prefactor MUST accept
        # eig=None in rpt/rptt and reproduce the exact same expressions
        # when it is given (bitwise-identical hoisting, not a numerical
        # change).  prefactor_soa(ixy, qs_l, qs_r, params) is the SoA
        # variant for rpt_soa.
        self.prefactor = None
        self.prefactor_soa = None
        # True when rpt/rptt are imp-independent pure linear maps of
        # asdq (q_l/q_r enter only through the eigensystem): the 3D
        # kernel may then stack several asdq inputs on a batch axis
        # after the equation axis and make ONE call per (sweep,
        # transverse-axis) pair — fewer, larger VPU op chains, values
        # bitwise identical per element.
        self.transverse_batchable = False
        self.evec = None      # eigenvector hook for char_decomp (evec.f90)
        # SoA fast-path variants (classic/soa.py protocol); optional —
        # solvers without them run the generic AoS kernels
        self.rpn_soa = None
        self.rpt_soa = None
        # physical-admissibility predicate fn(q, aux, params) -> bool[*n];
        # used by SharpClaw to fall back to first-order reconstruction in
        # cells whose WENO edge states would be unphysical (negative
        # density/pressure near strong shocks — e.g. Woodward-Colella)
        self.positivity = None
        # physical flux fn(ixy, q, aux, params) -> f (num_eqn, *n); used
        # by SharpClaw for the in-cell total fluctuation f(qr)-f(ql)
        # (reference flux1.f90's tfluct-free default) instead of a second
        # Riemann solve.  flux_soa is the per-plane variant
        # fn(ixy, qs_tuple, params) -> tuple (None = zero component).
        self.flux = None
        self.flux_soa = None
        self.requires = tuple(requires)  # required problem_data keys

    def __repr__(self):
        return (f"RiemannSolver({self.name}, num_eqn={self.num_eqn}, "
                f"num_waves={self.num_waves})")


from .advection import (advection_1D, advection_2D, advection_3D,  # noqa: E402,F401
                        vc_advection_1D, vc_advection_2D,
                        vc_advection_fwave_1D, vc_advection_fwave_2D)
from .acoustics import acoustics_1D, acoustics_2D, acoustics_3D  # noqa: E402,F401
from .burgers import burgers_1D, burgers_2D, burgers_3D  # noqa: E402,F401
from .euler import (euler_with_efix_1D, euler_roe_1D, euler_hlle_1D,  # noqa: E402,F401
                    euler_4wave_2D, euler_5wave_2D, euler_3D)
from .shallow import (shallow_roe_with_efix_1D, shallow_hlle_1D,  # noqa: E402,F401
                      shallow_roe_with_efix_2D,
                      shallow_bathymetry_fwave_1D,
                      shallow_bathymetry_fwave_2D, sw_aug_1D, sw_aug_2D)
from .traffic import traffic_1D  # noqa: E402,F401
from .kpp import kpp_2D  # noqa: E402,F401
from .acoustics_var import (acoustics_variable_1D,  # noqa: E402,F401
                            vc_acoustics_2D, vc_acoustics_3D)
from .psystem import psystem_1D  # noqa: E402,F401
from .shallow_sphere import shallow_sphere_fwave_2D  # noqa: E402,F401
from .mhd import mhd_1D  # noqa: E402,F401
from .psystem2d import psystem_2D  # noqa: E402,F401

ALL = {s.name: s for s in [
    advection_1D, advection_2D, advection_3D, vc_advection_1D,
    vc_advection_2D, vc_advection_fwave_1D, vc_advection_fwave_2D,
    acoustics_1D, acoustics_2D, acoustics_3D,
    burgers_1D, burgers_2D, burgers_3D,
    euler_with_efix_1D, euler_roe_1D, euler_hlle_1D, euler_4wave_2D,
    euler_5wave_2D, euler_3D,
    shallow_roe_with_efix_1D, shallow_hlle_1D, shallow_roe_with_efix_2D,
    traffic_1D, kpp_2D, acoustics_variable_1D, vc_acoustics_2D,
    vc_acoustics_3D, psystem_1D,
    shallow_bathymetry_fwave_1D, shallow_bathymetry_fwave_2D,
    sw_aug_1D, sw_aug_2D,
    psystem_2D, shallow_sphere_fwave_2D, mhd_1D,
]}
