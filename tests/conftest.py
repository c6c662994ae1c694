"""Test configuration: force CPU (8 virtual devices) so tests never contend
with the single TPU tunnel and distributed logic runs on a simulated mesh."""

import os

# Must happen before jax (or anything importing jax) initializes a backend.
os.environ["PALLAS_AXON_POOL_IPS"] = ""   # skip axon TPU-tunnel registration
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
