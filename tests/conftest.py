"""Test config: run everything on a virtual 8-device CPU mesh.

This replaces the reference's total absence of tests (SURVEY.md §4): the real
pjit/mesh/sharding code paths run on 8 fake CPU devices, and Pallas kernels
run in interpreter mode off-TPU, so the full stack is CI-testable without
hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
