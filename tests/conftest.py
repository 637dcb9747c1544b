"""Test configuration: run on CPU with 8 virtual devices.

The idiomatic JAX substitute for multi-chip testing without hardware
(SURVEY.md §4): an 8-device host-platform mesh exercises the same GSPMD
partitioning code paths as a real TPU slice.

Note: the ambient environment exports JAX_PLATFORMS=axon and the axon plugin
re-asserts itself over the env var, so the platform must be forced via
jax.config AFTER importing jax (before any backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
