"""Utilities: CLI runner and test machinery.

Rebuild of reference ``src/pyclaw/util.py`` (:~1-350; SURVEY.md §2.1):
``run_app_from_main`` (the de-facto CLI: bare key=value argv tokens),
``check_diff`` (tolerance comparison returning None on pass), and
``gen_variants``/``test_app`` (cartesian test fan-out over kernel backends
and solver types — the dual-implementation oracle of §4).
"""

from __future__ import annotations

import sys

import numpy as np


def _coerce(value):
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            pass
    if value in ("True", "true"):
        return True
    if value in ("False", "false"):
        return False
    if value == "None":
        return None
    return value


def run_app_from_main(application, setplot=None):
    """Parse sys.argv 'key=value' tokens into kwargs and run the app
    (reference util.run_app_from_main)."""
    kwargs = {}
    plot_requested = False
    for arg in sys.argv[1:]:
        if arg in ("htmlplot", "iplot"):
            plot_requested = arg
            continue
        if "=" not in arg:
            raise ValueError(f"arguments must be key=value pairs, got {arg!r}")
        key, value = arg.split("=", 1)
        kwargs[key] = _coerce(value)

    claw = application(**kwargs)
    status = claw.run()
    if plot_requested == "iplot":
        claw.plot(setplot=setplot)
    elif plot_requested == "htmlplot":
        from . import plot
        plot.html_plot(outdir=claw.outdir, setplot=setplot)
    return status


def check_diff(expected, test, **kwargs):
    """Tolerance comparison (reference util.check_diff): returns None on
    pass, else (expected, test, diff-info)."""
    expected = np.asarray(expected)
    test = np.asarray(test)
    if "reltol" in kwargs:
        err = np.max(np.abs(expected - test)) / np.max(np.abs(expected))
        if err < kwargs["reltol"]:
            return None
        return (expected, test, f"relative error {err} > {kwargs['reltol']}")
    elif "abstol" in kwargs:
        err = np.max(np.abs(expected - test))
        if err < kwargs["abstol"]:
            return None
        return (expected, test, f"absolute error {err} > {kwargs['abstol']}")
    elif "delta" in kwargs:
        diff = expected - test
        if np.all(np.abs(diff) < kwargs["delta"]):
            return None
        return (expected, test, f"delta exceeded {kwargs['delta']}")
    raise ValueError("check_diff needs reltol, abstol, or delta")


def gen_variants(application, verifier, kernel_languages=("xla",),
                 solver_type="classic", **kwargs):
    """Yield one test callable per backend variant (reference
    util.gen_variants; 'kernel_languages' maps to backends here)."""
    for backend in kernel_languages:
        kw = dict(kwargs)
        kw["kernel_language"] = backend
        kw["solver_type"] = solver_type
        yield lambda kw=kw: test_app(application, verifier, kw)


def test_app(application, verifier, kwargs):
    kwargs = dict(kwargs)
    kwargs.setdefault("outdir", None)
    claw = application(**kwargs)
    claw.run()
    result = verifier(claw)
    if result is not None:
        raise AssertionError(f"verification failed: {result[2] if len(result) > 2 else result}")
    return None
