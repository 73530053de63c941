"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Kernel tests run on a virtual 8-device CPU mesh (deterministic, no TPU
needed); the real-TPU path is exercised by bench.py and the driver's
compile checks. Must run before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (a remote
# TPU tunnel), which would route every test op over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
# Lean limb graphs (lax.scan carry/CIOS bodies) BEFORE any package
# import: fields/limbs.py reads these at module import, and the
# unrolled chains that the TPU wants at runtime cost >10x the XLA:CPU
# compile time (the smoke test measured 714 s unrolled vs 65 s lean
# for the same D=8 sharded prove). Results are bit-identical.
os.environ.setdefault("ISTPU_CARRY_UNROLL", "1")
os.environ.setdefault("ISTPU_MONT_UNROLL", "1")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
# The limb-arithmetic graphs are huge; dial LLVM back for test compiles
# (execution here is tiny-shape correctness work, not perf).
xla_flags += " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = xla_flags

# The image's sitecustomize force-selects the remote-TPU (axon) platform
# via jax.config, which wins over JAX_PLATFORMS; override it back.
# ISTPU_TEST_PLATFORM=tpu keeps the real chip (single-device tests only).
import jax  # noqa: E402

if os.environ.get("ISTPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: kernel graphs here are large (unrolled
# limb arithmetic), so caching compiles across test runs matters.
# SEPARATE dir from the TPU cache: concurrent writers on one dir have
# produced corrupt entries (segfault in AOT deserialization), and CPU
# executables from another machine SIGILL on feature mismatch.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# ---------------------------------------------------------------- tiers
# FAST tier (pytest -m fast): files whose full cold compile+run stays
# in seconds on a 1-core host (measured 2026-08-20: host-math/IO files
# 3.5 s; limbs+vec_ops 37 s cold). Everything else is implicitly slow;
# the heaviest suites additionally self-skip without ISTPU_HEAVY_TESTS.
FAST_FILES = {
    "test_refmath.py",
    "test_binfile_hardening.py",
    "test_native_io.py",
    "test_runtime.py",
    "test_limbs.py",
    "test_vec_ops.py",
    "test_ntt.py",
    "test_fast_setup.py",
    "test_multichip_smoke.py",
    "test_serve_lean.py",
    # Plain `pytest tests/` measured COLD (fresh compile cache, 1 core,
    # 2026-08-21): ~22 min total, 141 passed / 11 heavy-gated skips —
    # within the 30-min cold budget (VERDICT r4 #7). Slowest files:
    # test_serve_lean ~4 min (one tiny end-to-end prove twice),
    # test_multiproc ~3 min, test_multichip ~5 min, test_mxu_ntt ~4 min.
    # The heaviest redundant variants stay ISTPU_HEAVY_TESTS-gated.
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.fspath.basename in FAST_FILES:
            item.add_marker(_pytest.mark.fast)


import pytest as _pytest_mod


@_pytest_mod.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite compiles ~150 big limb-arithmetic modules in one
    process; with all of them live, XLA:CPU's executable
    (de)serialization segfaulted twice near the end of the run
    (jax compilation_cache put/get_executable_and_time — process-
    cumulative state, neither half of the suite reproduces alone).
    Modules rarely share jit entries across files, so dropping the
    in-process caches at module boundaries costs little and keeps the
    full `pytest tests/` invocation green."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
