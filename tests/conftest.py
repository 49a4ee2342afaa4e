"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "multi-node without a cluster" mechanism (SURVEY.md #4): tests never
need TPU hardware; multi-chip sharding is validated on fake CPU devices.
"""

import os

# Hard override: the environment presets JAX_PLATFORMS=axon (remote TPU tunnel), which
# would run every eager test op over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
