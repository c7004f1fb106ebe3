"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharded code paths are
exercised on host-platform virtual devices exactly as SURVEY.md §4
prescribes for the TPU build.

Note: the environment's sitecustomize registers the 'axon' TPU backend and
imports jax before pytest starts, so plain JAX_PLATFORMS env vars are too
late — we override via jax.config instead (still before any computation).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent on-disk compile cache: the suite's wall time is dominated by
# XLA-CPU compilation (measured: the loop-pipeline fixture spends ~70% of
# its first-40-frame window in one-time compiles; steady state is
# ~0.5 s/frame), and the per-module clear_caches below re-triggers it.
# With the disk cache, cleared/repeat compiles deserialize instead of
# re-running LLVM — same mechanism bench.py uses through the TPU tunnel.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.device_count() == 8, jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of XLA CPU programs; letting them
    accumulate has produced segfaults inside backend_compile_and_load
    late in the run (LLVM resource exhaustion). Modules rarely share
    shapes, so the lost cache hits are cheap."""
    yield
    jax.clear_caches()
