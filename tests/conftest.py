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
# XLA:CPU compile time dominates this suite on a 1-core box; backend
# optimization level 0 cuts it ~30% (114 -> 80 s on the heaviest
# pipeline3 test) and test inputs are tiny, so run-time codegen quality
# is irrelevant here.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

# Loop-unroll depths need no env override here: the kernel builders
# resolve CPU-friendly defaults per backend (ops/sweep_scan.resolve_unroll).

# The axon sitecustomize imports jax and pins jax_platforms before conftest
# runs; undo that so tests always see the virtual 8-device CPU mesh.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: test programs are deterministic, so
# repeat suite runs load executables from disk instead of recompiling
# (measured 46.7 -> 5.0 s for the v3 pipeline program). The round-2
# "put_executable_and_time segfault" that kept this off no longer
# reproduces on the current jax; if it ever returns, set
# TIKTOKEN_TPU_TEST_EXEC_CACHE=0.
if os.environ.get("TIKTOKEN_TPU_TEST_EXEC_CACHE", "1") != "0":
    import jax

    # repo-local: /tmp is wiped between CI sessions, which would make
    # every fresh session pay the full ~67 min cold compile bill again
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".cache",
        "xla-cpu-tests",
    )
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
