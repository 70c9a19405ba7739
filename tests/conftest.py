"""Test configuration: run every test on a virtual 8-device CPU mesh.

The container's sitecustomize registers a TPU ('axon') PJRT plugin and
pins JAX_PLATFORMS=axon; tests must run on CPU with 8 virtual devices
(SURVEY.md §4d), so we force the platform through jax.config before any
backend is initialized.
"""

import os

# Hermetic-but-warm tests: the persistent compile cache is scoped by an
# exact CPU-feature fingerprint, so AOT code is only ever reloaded on an
# identical host (a different pool machine gets a cold directory instead
# of cpu_aot_loader's mismatched-machine-features numerics drift).
os.environ["ESC_TPU_NO_COMPILE_CACHE"] = "1"  # skip the package default


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            lines = [ln for ln in f
                     if ln.startswith(("model name", "flags"))]
        blob = "".join(sorted(set(lines)))
    except OSError:
        import platform

        blob = platform.processor() + platform.machine()
    return hashlib.sha256(blob.encode()).hexdigest()[:16]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "esc_tpu_tests",
                 _cpu_fingerprint()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# The suite runs with PRODUCTION compilation (full XLA optimizations).
# An earlier default disabled most optimizations to cut cold-compile
# time ~1.8x, but that (a) made unoptimized code the thing actually
# executed — with the persistent compile cache warm, full-opt runs the
# same tests ~1.75x FASTER wall-clock (165s vs ~290s for the 5
# heaviest training tests) — and (b) numerically destabilized the
# adversarial train step (finite ~4e5-norm generator grads -> NaN
# params on the 2nd GAN update; production compilation and the eager
# replay of the same update are both stable). Cold compiles are a
# one-time cost per machine fingerprint. Set ESC_TPU_FAST_COMPILE=1
# to restore the old fast-compile/slow-run behavior — and if a
# multi-update graph produces NaN only under that flag, suspect the
# flag before the trainer (tests/test_adv_stability.py re-enables
# full opts locally so it holds either way).
if os.environ.get("ESC_TPU_FAST_COMPILE"):
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _vma_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux
        return 0


def _vma_limit() -> int:
    """Current vm.max_map_count, after trying to raise it.

    NOTE: this writes the SYSTEM-WIDE sysctl vm.max_map_count (root-only;
    silently keeps the default elsewhere). The full suite accumulates
    ~64k LLVM-JIT mappings and segfaults at the kernel default of 65530
    without it. The original value is restored at interpreter exit; set
    ESC_TPU_NO_RAISE_MAP_COUNT=1 to forbid the write entirely.
    """
    path = "/proc/sys/vm/max_map_count"
    try:
        if not os.environ.get("ESC_TPU_NO_RAISE_MAP_COUNT"):
            try:
                with open(path) as f:
                    prev = f.read().strip()
                if int(prev) < 262144:
                    with open(path, "w") as f:
                        f.write("262144")
                    import atexit

                    def _restore(prev=prev):
                        try:
                            with open(path, "w") as f:
                                f.write(prev)
                        except OSError:
                            pass
                    atexit.register(_restore)
            except OSError:
                pass
        with open(path) as f:
            return int(f.read())
    except OSError:  # non-Linux
        return 1 << 30


_VMA_THRESHOLD = int(_vma_limit() * 0.6)


@pytest.fixture(autouse=True, scope="module")
def _vma_guard():
    """Bound the process's memory-map count.

    Every XLA CPU compile leaves LLVM JIT mappings behind; a full-suite
    run accumulates ~64k VMAs and segfaults inside backend_compile when
    it hits the kernel's vm.max_map_count (default 65530) — verified by
    monitoring /proc/self/maps during a crashing run. We raise the limit
    where permitted, and drop the jit caches under pressure: that
    releases the executables (and their maps) at the cost of recompiling
    shared graphs in later modules.
    """
    yield
    if _vma_count() > _VMA_THRESHOLD:
        import gc

        jax.clear_caches()
        gc.collect()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long integration runs (skipped by default; set "
        "ESC_TPU_SLOW=1 to include — CI runs the fast tier, the full "
        "tier is exercised before each release/round)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("ESC_TPU_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set ESC_TPU_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(53)
