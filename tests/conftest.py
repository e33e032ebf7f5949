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


# ---------------------------------------------------------------------------
# Keep the process under vm.max_map_count (default 65530, same on GitHub
# runners): every jitted XLA executable holds mmap'd JIT-code regions, and
# the full suite compiles thousands of programs — left alone, the process
# crosses the map limit after ~165 tests and the NEXT compile dies inside
# LLVM (SIGSEGV/SIGABRT in backend_compile_and_load; measured 58k+ maps
# right before the crash).  Dropping the compilation caches at module
# boundaries unmaps dead executables; cross-module cache reuse is near zero
# (each module compiles its own shapes), so this costs seconds, not minutes.
# ---------------------------------------------------------------------------

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_code_maps():
    yield
    jax.clear_caches()
    gc.collect()
