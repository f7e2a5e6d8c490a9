"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend: multi-chip
sharding logic (frame-axis context parallelism, data parallelism) is exercised
on host CPU devices, so the full parallel path is testable without TPU pods.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize imports jax and registers the axon TPU backend at
# interpreter startup, so JAX_PLATFORMS in the environment is already locked
# in; override through the config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
