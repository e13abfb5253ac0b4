"""Test env: force the CPU backend with 8 virtual devices for mesh tests.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon before conftest runs, so plain env assignment is not
enough — override through jax.config before any backend is initialized.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
