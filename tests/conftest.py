"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Must run before the first jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's parallel LLVM codegen segfaults intermittently on this
# repo's larger programs (observed twice in _dispatch_chunks3 compiles,
# always inside backend_compile); serializing codegen avoids the race
# and costs nothing on the 1-core CI box.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# NOTE: the jax persistent compilation cache is deliberately NOT enabled:
# executable serialization segfaults the CPU backend on some of this
# repo's programs (cache-write crash inside put_executable_and_time).
# Loop-unroll depths need no env override here: the kernel builders
# resolve CPU-friendly defaults per backend (ops/sweep_scan.resolve_unroll).

# The axon sitecustomize imports jax and pins jax_platforms before conftest
# runs; undo that so tests always see the virtual 8-device CPU mesh.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Full-suite runs segfault flakily inside XLA:CPU backend_compile
    late in the run (3/3 observed crashes were in the compile-heaviest
    module after ~150 tests' worth of accumulated executables; the same
    tests pass standalone). Dropping jit caches between modules keeps
    the per-process executable population small. Cross-module compiled
    state is per-engine anyway, so this costs little."""
    yield
    if "jax" in sys.modules:
        import jax

        jax.clear_caches()
        gc.collect()
