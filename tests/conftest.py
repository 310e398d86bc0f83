"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: the environment's sitecustomize imports jax at interpreter start (registering the
TPU backend), so JAX_PLATFORMS env vars set here are too late — we must update jax.config
directly. XLA_FLAGS still works because the CPU backend initializes lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# this box may have very few cores; 8 virtual devices then execute sequentially and the
# default 20s/40s collective rendezvous timeouts fire spuriously
if "collective_call_terminate" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
