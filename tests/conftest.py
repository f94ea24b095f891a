"""Test harness config: force an 8-virtual-device CPU platform so sharding
tests exercise a real Mesh without TPU hardware (cf. SURVEY.md §2.13).

Note: the image's sitecustomize pre-registers the TPU backend and sets
JAX_PLATFORMS=axon, so the env var alone is not enough — we must override the
jax config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
