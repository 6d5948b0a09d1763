"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/collective logic is exercised without TPU hardware
(SURVEY.md §4 item 4).

Note: the environment's axon TPU plugin re-inserts itself into
jax_platforms regardless of JAX_PLATFORMS, so the override must go through
jax.config after import (otherwise every eager op becomes a TPU tunnel
round-trip and the suite is ~100x slower)."""

import os

# Interpret-mode megakernel tests scale with TN (lanes per tile); the
# production default (1024, tuned for v5e VMEM/throughput) just doubles
# CPU test runtime. The kernels are TN-generic, so the suite pins the
# smaller layout.
os.environ.setdefault("RRT_TN", "512")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
