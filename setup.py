from setuptools import find_packages, setup

setup(
    name="micro_diffusion_tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) text-to-image latent diffusion training and "
        "sampling framework (MicroDiT capabilities)"
    ),
    packages=find_packages(include=["micro_diffusion_tpu", "micro_diffusion_tpu.*"]),
    python_requires=">=3.10",
    # Core deps (all preinstalled in the dev image; listed for completeness):
    # jax, flax, optax, orbax-checkpoint, chex, einops, numpy, pyyaml, pillow, safetensors
)
