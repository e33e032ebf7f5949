"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on a simulated 8-device CPU mesh (the standard "multi-chip without
a pod" setup); the real-TPU path is exercised by bench.py and the driver's
compile checks.  float64 is enabled because the reference test suite sweeps
Float32/Float64/ComplexF32/ComplexF64.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
