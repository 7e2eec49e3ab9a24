"""Host-native (C++) runtime components, loaded via ctypes.

The TPU compute path is XLA/Pallas; the pieces of the runtime that run
on the host — frame IO formatting, here — get native implementations
(reference analog: the f2py native layer + the iso_c kernel demo;
SURVEY.md §2.5/§3.5).  Sources live next to this file and are compiled
on first use with g++ into a per-user cache keyed by source hash, so
the package needs no build step and degrades gracefully (pure-Python
fallback) where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_HERE = os.path.dirname(__file__)
_lib = None
_lib_tried = False


def _cache_dir():
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(root, "pyclaw_tpu")


def _build(src_path):
    with open(src_path, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out_dir = _cache_dir()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"libclawio-{tag}.so")
    if not os.path.exists(out):
        tmp = out + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", src_path, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, out)  # atomic: concurrent builders race safely
    return out


def get_io_lib():
    """ctypes handle to the native IO library, or None (no g++ / build
    failure / PYCLAW_TPU_NO_NATIVE=1) — callers fall back to Python."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("PYCLAW_TPU_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(_build(os.path.join(_HERE, "fastio.cpp")))
        lib.claw_write_ascii.restype = ctypes.c_int
        lib.claw_write_ascii.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
