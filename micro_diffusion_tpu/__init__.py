"""micro_diffusion_tpu: a TPU-native (JAX / XLA / Pallas / pjit) text-to-image latent
diffusion framework with the capabilities of SonyResearch/micro_diffusion ("MicroDiT").

Layout:
    models/    - DiT backbone, EDM diffusion wrapper, frozen encoders (VAE / CLIP / T5),
                 torch-checkpoint interop
    ops/       - TPU compute ops: attention (XLA + Pallas flash), token masking, fused adaLN
    parallel/  - device mesh construction and sharding rules (dp / fsdp / expert axes)
    train/     - jit'd train step, optimizer/schedules/EMA, trainer loop, callbacks, config
    datasets/  - MDS shard format reader/writer, streaming latents loader, prepare pipelines
"""

__version__ = "0.1.0"
