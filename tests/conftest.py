"""Test configuration: run every test on a virtual 8-device CPU mesh.

The container's sitecustomize registers a TPU ('axon') PJRT plugin and
pins JAX_PLATFORMS=axon; tests must run on CPU with 8 virtual devices
(SURVEY.md §4d), so we force the platform through jax.config before any
backend is initialized.
"""

import os

# Hermetic tests: never load persistent-cache AOT code (it may have been
# compiled by a different host CPU in the pool — cpu_aot_loader then
# warns about mismatched machine features and numerics can drift).
os.environ["ESC_TPU_NO_COMPILE_CACHE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Compile time dominates suite wall-clock (single CPU core, everything
# XLA-compiled). Disabling most XLA optimizations cuts compiles ~1.8x;
# golden torch-parity tolerances were verified unaffected. Set
# ESC_TPU_FULL_OPT=1 to run tests with production compilation.
if not os.environ.get("ESC_TPU_FULL_OPT"):
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _vma_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux
        return 0


@pytest.fixture(autouse=True, scope="module")
def _vma_guard():
    """Bound the process's memory-map count.

    Every XLA CPU compile leaves LLVM JIT mappings behind; a full-suite
    run accumulates ~64k VMAs and segfaults inside backend_compile when
    it hits the kernel's vm.max_map_count (default 65530) — verified by
    monitoring /proc/self/maps during a crashing run. Dropping the jit
    caches under pressure releases the executables (and their maps) at
    the cost of recompiling shared graphs in later modules.
    """
    yield
    if _vma_count() > 40_000:
        import gc

        jax.clear_caches()
        gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(53)
