"""Test configuration: run the whole suite on CPU with 8 virtual devices.

Mirrors the reference CI strategy (SURVEY.md §4): distributed tests run on
a small in-node world ("mpiexec -n 4" there; an 8-device virtual CPU mesh
here via --xla_force_host_platform_device_count) and correctness runs in
float64 — which is native-speed on CPU and software-emulated on TPU.
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
