"""Test configuration: force an 8-device CPU platform so sharding tests run
without TPU hardware (the TPU-world equivalent of multi-node simulation).

The axon TPU tunnel pins `jax_platforms` programmatically, so the env var
alone is not enough — we must update the config after importing jax."""

import os

# DIGAT_TPU_TESTS=1 leaves the real backend in place so the hardware
# kernel-validation tests (test_kernels_tpu.py) can run.
if not os.environ.get("DIGAT_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
