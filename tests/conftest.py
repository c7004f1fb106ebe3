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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.device_count() == 8, jax.devices()
