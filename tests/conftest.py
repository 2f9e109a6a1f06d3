"""Test configuration: force CPU with 8 virtual devices (for sharding tests)
and enable x64 (the solvers' timelike precision contract expects f64 when
available, mirroring the reference's float64 time dtype).

Note: this container's sitecustomize force-registers the `axon` TPU backend
and overrides JAX_PLATFORMS, so the platform must be pinned via
`jax.config.update` after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# XLA:CPU's LLVM JIT segfaults once a single process accumulates enough
# compiled executables (observed at ~350-390 tests into the suite, always
# inside backend_compile_and_load, at three unrelated tests).  Dropping
# references to stale executables periodically keeps total live JIT code
# bounded; the recompiles this forces cost far less than a dead process.
_CLEAR_EVERY = 40
_test_counter = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()
