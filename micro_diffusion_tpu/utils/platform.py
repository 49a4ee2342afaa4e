"""Platform override for CLI entry points.

The dev image's sitecustomize registers the remote-TPU ('axon') backend and pins
JAX_PLATFORMS at interpreter start, so exporting JAX_PLATFORMS=cpu alone does not
move a *subprocess* off the chip (tests/conftest.py documents the same for
pytest). CLI tools call :func:`apply_platform_override` first thing in main();
``MDT_PLATFORM=cpu`` then forces the CPU backend via jax.config - the supported
switch that works after the backend is registered but before first use.
"""

import os


def apply_platform_override() -> None:
    plat = os.environ.get("MDT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
