"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "multi-node without a cluster" mechanism (SURVEY.md #4): tests never
need TPU hardware; multi-chip sharding is validated on fake CPU devices.

IMPORTANT: the dev image presets JAX_PLATFORMS=axon (remote TPU tunnel) and its
sitecustomize hook locks the platform at jax import - setting the env var alone is NOT
enough; jax.config.update must be called too, before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()

# Persistent compilation cache: the e2e tests compile many near-identical train/eval
# programs; caching executables on disk cuts suite time substantially across runs.
import tempfile

_cache_dir = os.path.join(tempfile.gettempdir(), "mdt_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
