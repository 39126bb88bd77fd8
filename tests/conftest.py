"""Test configuration: force an 8-device CPU platform so sharding tests run
without TPU hardware (the TPU-world equivalent of multi-node simulation).

The axon TPU tunnel pins `jax_platforms` programmatically, so the env var
alone is not enough — we must update the config after importing jax."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
