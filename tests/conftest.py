"""Test configuration: force CPU (8 virtual devices) so tests never contend
with the single TPU tunnel and distributed logic runs on a simulated mesh.

The image's sitecustomize registers the axon TPU backend at interpreter
startup (before conftest), so setting JAX_PLATFORMS in the environment here
is too late — we must override the live jax config instead.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
