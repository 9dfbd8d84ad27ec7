"""Test harness: run JAX on a virtual 8-device CPU mesh.

Replaces the reference's torchrun-only multi-GPU testing story
(SURVEY.md §4): sharding correctness is validated single-process on
virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; the
# config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
