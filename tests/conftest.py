"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: the environment's sitecustomize imports jax at interpreter start (registering the
TPU backend), so JAX_PLATFORMS env vars set here are too late — we must update jax.config
directly. XLA_FLAGS still works because the CPU backend initializes lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
